from .modeling_phimoe import PhimoeConfig, PhimoeForCausalLM
