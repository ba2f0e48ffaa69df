"""SAM2 configs (reference src/transformers/models/sam2/configuration_sam2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Sam2HieraDetConfig(PretrainedConfig):
    model_type = "sam2_hiera_det_model"
    base_config_key = "backbone_config"

    def __init__(self, hidden_size=96, num_attention_heads=1, num_channels=3,
                 image_size=None, patch_kernel_size=None, patch_stride=None,
                 patch_padding=None, query_stride=None,
                 window_positional_embedding_background_size=None,
                 num_query_pool_stages=3, blocks_per_stage=None,
                 embed_dim_multiplier=2.0, num_attention_heads_multiplier=2.0,
                 window_size_per_stage=None, global_attention_blocks=None,
                 mlp_ratio=4.0, hidden_act="gelu", layer_norm_eps=1e-6,
                 initializer_range=0.02, **kwargs):
        self.hidden_size = hidden_size
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size if image_size is not None else [1024, 1024]
        self.patch_kernel_size = patch_kernel_size if patch_kernel_size is not None else [7, 7]
        self.patch_stride = patch_stride if patch_stride is not None else [4, 4]
        self.patch_padding = patch_padding if patch_padding is not None else [3, 3]
        self.query_stride = query_stride if query_stride is not None else [2, 2]
        self.window_positional_embedding_background_size = (
            window_positional_embedding_background_size
            if window_positional_embedding_background_size is not None else [7, 7])
        self.num_query_pool_stages = num_query_pool_stages
        self.blocks_per_stage = blocks_per_stage if blocks_per_stage is not None else [1, 2, 7, 2]
        self.window_size_per_stage = (window_size_per_stage
                                      if window_size_per_stage is not None else [8, 4, 14, 7])
        self.global_attention_blocks = (global_attention_blocks
                                        if global_attention_blocks is not None else [5, 7, 9])
        self.mlp_ratio = mlp_ratio
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.initializer_range = initializer_range
        n = len(self.blocks_per_stage)
        self.embed_dim_per_stage = kwargs.pop(
            "embed_dim_per_stage",
            [int(hidden_size * embed_dim_multiplier**i) for i in range(n)])
        self.num_attention_heads_per_stage = kwargs.pop(
            "num_attention_heads_per_stage",
            [int(num_attention_heads * num_attention_heads_multiplier**i) for i in range(n)])
        super().__init__(**kwargs)


class Sam2VisionConfig(PretrainedConfig):
    model_type = "sam2_vision_model"
    base_config_key = "vision_config"
    sub_configs = {"backbone_config": Sam2HieraDetConfig}

    def __init__(self, backbone_config=None, backbone_channel_list=None,
                 backbone_feature_sizes=None, fpn_hidden_size=256, fpn_kernel_size=1,
                 fpn_stride=1, fpn_padding=0, fpn_top_down_levels=None,
                 num_feature_levels=3, hidden_act="gelu", layer_norm_eps=1e-6,
                 initializer_range=0.02, **kwargs):
        if isinstance(backbone_config, dict) or backbone_config is None:
            backbone_config = Sam2HieraDetConfig(**{
                k: v for k, v in (backbone_config or {}).items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.backbone_channel_list = (backbone_channel_list
                                      if backbone_channel_list is not None
                                      else [768, 384, 192, 96])
        self.backbone_feature_sizes = (backbone_feature_sizes
                                       if backbone_feature_sizes is not None
                                       else [[256, 256], [128, 128], [64, 64]])
        self.fpn_hidden_size = fpn_hidden_size
        self.fpn_kernel_size = fpn_kernel_size
        self.fpn_stride = fpn_stride
        self.fpn_padding = fpn_padding
        self.fpn_top_down_levels = (fpn_top_down_levels
                                    if fpn_top_down_levels is not None else [2, 3])
        self.num_feature_levels = num_feature_levels
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Sam2PromptEncoderConfig(PretrainedConfig):
    base_config_key = "prompt_encoder_config"

    def __init__(self, hidden_size=256, image_size=1024, patch_size=16,
                 mask_input_channels=16, num_point_embeddings=4, hidden_act="gelu",
                 layer_norm_eps=1e-6, scale=1, **kwargs):
        self.hidden_size = hidden_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.mask_input_channels = mask_input_channels
        self.num_point_embeddings = num_point_embeddings
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.scale = scale
        super().__init__(**kwargs)


class Sam2MaskDecoderConfig(PretrainedConfig):
    base_config_key = "mask_decoder_config"

    def __init__(self, hidden_size=256, hidden_act="gelu", mlp_dim=2048,
                 num_hidden_layers=2, num_attention_heads=8,
                 attention_downsample_rate=2, num_multimask_outputs=3,
                 iou_head_depth=3, iou_head_hidden_dim=256,
                 dynamic_multimask_via_stability=True,
                 dynamic_multimask_stability_delta=0.05,
                 dynamic_multimask_stability_thresh=0.98, layer_norm_eps=1e-6,
                 **kwargs):
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.mlp_dim = mlp_dim
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.attention_downsample_rate = attention_downsample_rate
        self.num_multimask_outputs = num_multimask_outputs
        self.iou_head_depth = iou_head_depth
        self.iou_head_hidden_dim = iou_head_hidden_dim
        self.dynamic_multimask_via_stability = dynamic_multimask_via_stability
        self.dynamic_multimask_stability_delta = dynamic_multimask_stability_delta
        self.dynamic_multimask_stability_thresh = dynamic_multimask_stability_thresh
        self.layer_norm_eps = layer_norm_eps
        super().__init__(**kwargs)


class Sam2Config(PretrainedConfig):
    model_type = "sam2"
    sub_configs = {"vision_config": Sam2VisionConfig,
                   "prompt_encoder_config": Sam2PromptEncoderConfig,
                   "mask_decoder_config": Sam2MaskDecoderConfig}

    def __init__(self, vision_config=None, prompt_encoder_config=None,
                 mask_decoder_config=None, initializer_range=0.02, **kwargs):
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Sam2VisionConfig(**{
                k: v for k, v in (vision_config or {}).items() if k != "model_type"})
        if isinstance(prompt_encoder_config, dict) or prompt_encoder_config is None:
            prompt_encoder_config = Sam2PromptEncoderConfig(**{
                k: v for k, v in (prompt_encoder_config or {}).items() if k != "model_type"})
        if isinstance(mask_decoder_config, dict) or mask_decoder_config is None:
            mask_decoder_config = Sam2MaskDecoderConfig(**{
                k: v for k, v in (mask_decoder_config or {}).items() if k != "model_type"})
        self.vision_config = vision_config
        self.prompt_encoder_config = prompt_encoder_config
        self.mask_decoder_config = mask_decoder_config
        self.initializer_range = initializer_range
        super().__init__(**kwargs)
