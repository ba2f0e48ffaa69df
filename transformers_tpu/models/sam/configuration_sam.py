"""SAM configs (reference src/transformers/models/sam/configuration_sam.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class SamPromptEncoderConfig(PretrainedConfig):
    model_type = "sam_prompt_encoder"

    def __init__(self, hidden_size=256, image_size=1024, patch_size=16,
                 mask_input_channels=16, num_point_embeddings=4, hidden_act="gelu",
                 layer_norm_eps=1e-6, **kwargs):
        self.hidden_size = hidden_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.image_embedding_size = image_size // patch_size
        self.mask_input_channels = mask_input_channels
        self.num_point_embeddings = num_point_embeddings
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        super().__init__(**kwargs)


class SamMaskDecoderConfig(PretrainedConfig):
    model_type = "sam_mask_decoder"

    def __init__(self, hidden_size=256, hidden_act="relu", mlp_dim=2048,
                 num_hidden_layers=2, num_attention_heads=8, attention_downsample_rate=2,
                 num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=256,
                 layer_norm_eps=1e-6, **kwargs):
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.mlp_dim = mlp_dim
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.attention_downsample_rate = attention_downsample_rate
        self.num_multimask_outputs = num_multimask_outputs
        self.iou_head_depth = iou_head_depth
        self.iou_head_hidden_dim = iou_head_hidden_dim
        self.layer_norm_eps = layer_norm_eps
        super().__init__(**kwargs)


class SamVisionConfig(PretrainedConfig):
    model_type = "sam_vision_model"

    def __init__(self, hidden_size=768, output_channels=256, num_hidden_layers=12,
                 num_attention_heads=12, num_channels=3, image_size=1024, patch_size=16,
                 hidden_act="gelu", layer_norm_eps=1e-6, attention_dropout=0.0,
                 initializer_range=1e-10, qkv_bias=True, mlp_ratio=4.0, use_abs_pos=True,
                 use_rel_pos=True, window_size=14, global_attn_indexes=(2, 5, 8, 11),
                 num_pos_feats=128, mlp_dim=None, **kwargs):
        self.hidden_size = hidden_size
        self.output_channels = output_channels
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.qkv_bias = qkv_bias
        self.mlp_ratio = mlp_ratio
        self.use_abs_pos = use_abs_pos
        self.use_rel_pos = use_rel_pos
        self.window_size = window_size
        self.global_attn_indexes = list(global_attn_indexes)
        self.num_pos_feats = num_pos_feats
        self.mlp_dim = int(hidden_size * mlp_ratio) if mlp_dim is None else mlp_dim
        self.scale = hidden_size // 2
        super().__init__(**kwargs)


class SamConfig(PretrainedConfig):
    model_type = "sam"
    sub_configs = {"vision_config": SamVisionConfig,
                   "prompt_encoder_config": SamPromptEncoderConfig,
                   "mask_decoder_config": SamMaskDecoderConfig}

    def __init__(self, vision_config=None, prompt_encoder_config=None,
                 mask_decoder_config=None, initializer_range=0.02, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = SamVisionConfig(**{k: v for k, v in vision_config.items()
                                               if k != "model_type"})
        self.vision_config = vision_config or SamVisionConfig()
        if isinstance(prompt_encoder_config, dict):
            prompt_encoder_config = SamPromptEncoderConfig(
                **{k: v for k, v in prompt_encoder_config.items() if k != "model_type"})
        self.prompt_encoder_config = prompt_encoder_config or SamPromptEncoderConfig()
        if isinstance(mask_decoder_config, dict):
            mask_decoder_config = SamMaskDecoderConfig(
                **{k: v for k, v in mask_decoder_config.items() if k != "model_type"})
        self.mask_decoder_config = mask_decoder_config or SamMaskDecoderConfig()
        self.initializer_range = initializer_range
        super().__init__(**kwargs)
