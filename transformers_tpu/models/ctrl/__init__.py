from .modeling_ctrl import CTRLConfig, CTRLLMHeadModel, CTRLModel
