from .modeling_glm4_moe import Glm4MoeConfig, Glm4MoeForCausalLM
