"""RT-DETR configs (reference src/transformers/models/rt_detr/configuration_rt_detr.py
and configuration_rt_detr_resnet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class RTDetrResNetConfig(PretrainedConfig):
    model_type = "rt_detr_resnet"

    def __init__(self, num_channels=3, embedding_size=64,
                 hidden_sizes=(256, 512, 1024, 2048), depths=(3, 4, 6, 3),
                 layer_type="bottleneck", hidden_act="relu",
                 downsample_in_first_stage=False, downsample_in_bottleneck=False,
                 out_indices=None, out_features=None, **kwargs):
        self.num_channels = num_channels
        self.embedding_size = embedding_size
        self.hidden_sizes = list(hidden_sizes)
        self.depths = list(depths)
        self.layer_type = layer_type
        self.hidden_act = hidden_act
        self.downsample_in_first_stage = downsample_in_first_stage
        self.downsample_in_bottleneck = downsample_in_bottleneck
        self.out_indices = list(out_indices) if out_indices is not None else [2, 3, 4]
        self.stage_names = ["stem"] + [f"stage{i}" for i in range(1, len(self.depths) + 1)]
        super().__init__(**kwargs)


class RTDetrConfig(PretrainedConfig):
    model_type = "rt_detr"
    sub_configs = {"backbone_config": RTDetrResNetConfig}

    def __init__(self, initializer_range=0.01, initializer_bias_prior_prob=None,
                 layer_norm_eps=1e-5, batch_norm_eps=1e-5, backbone_config=None,
                 freeze_backbone_batch_norms=True, encoder_hidden_dim=256,
                 encoder_in_channels=(512, 1024, 2048), feat_strides=(8, 16, 32),
                 encoder_layers=1, encoder_ffn_dim=1024, encoder_attention_heads=8,
                 dropout=0.0, activation_dropout=0.0, encode_proj_layers=(2,),
                 positional_encoding_temperature=10000,
                 encoder_activation_function="gelu", activation_function="silu",
                 eval_size=None, normalize_before=False, hidden_expansion=1.0,
                 d_model=256, num_queries=300, decoder_in_channels=(256, 256, 256),
                 decoder_ffn_dim=1024, num_feature_levels=3, decoder_n_points=4,
                 decoder_layers=6, decoder_attention_heads=8,
                 decoder_activation_function="relu", attention_dropout=0.0,
                 num_denoising=100, label_noise_ratio=0.5, box_noise_scale=1.0,
                 learn_initial_query=False, anchor_image_size=None,
                 disable_custom_kernels=True, with_box_refine=True,
                 matcher_alpha=0.25, matcher_gamma=2.0, matcher_class_cost=2.0,
                 matcher_bbox_cost=5.0, matcher_giou_cost=2.0, use_focal_loss=True,
                 auxiliary_loss=True, focal_loss_alpha=0.75, focal_loss_gamma=2.0,
                 weight_loss_vfl=1.0, weight_loss_bbox=5.0, weight_loss_giou=2.0,
                 eos_coefficient=1e-4, is_encoder_decoder=True, **kwargs):
        if backbone_config is None:
            backbone_config = RTDetrResNetConfig(out_indices=[2, 3, 4])
        elif isinstance(backbone_config, dict):
            backbone_config = RTDetrResNetConfig(
                **{k: v for k, v in backbone_config.items() if k != "model_type"})
        self.backbone_config = backbone_config
        self.initializer_range = initializer_range
        self.initializer_bias_prior_prob = initializer_bias_prior_prob
        self.layer_norm_eps = layer_norm_eps
        self.batch_norm_eps = batch_norm_eps
        self.freeze_backbone_batch_norms = freeze_backbone_batch_norms
        self.encoder_hidden_dim = encoder_hidden_dim
        self.encoder_in_channels = list(encoder_in_channels)
        self.feat_strides = list(feat_strides)
        self.encoder_layers = encoder_layers
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.num_attention_heads = encoder_attention_heads
        self.dropout = dropout
        self.activation_dropout = activation_dropout
        self.encode_proj_layers = list(encode_proj_layers)
        self.positional_encoding_temperature = positional_encoding_temperature
        self.encoder_activation_function = encoder_activation_function
        self.activation_function = activation_function
        self.eval_size = eval_size
        self.normalize_before = normalize_before
        self.hidden_expansion = hidden_expansion
        self.d_model = d_model
        self.hidden_size = d_model
        self.num_queries = num_queries
        self.decoder_in_channels = list(decoder_in_channels)
        self.decoder_ffn_dim = decoder_ffn_dim
        self.num_feature_levels = num_feature_levels
        self.decoder_n_points = decoder_n_points
        self.decoder_layers = decoder_layers
        self.decoder_attention_heads = decoder_attention_heads
        self.decoder_activation_function = decoder_activation_function
        self.attention_dropout = attention_dropout
        self.num_denoising = num_denoising
        self.label_noise_ratio = label_noise_ratio
        self.box_noise_scale = box_noise_scale
        self.learn_initial_query = learn_initial_query
        self.anchor_image_size = anchor_image_size
        self.disable_custom_kernels = disable_custom_kernels
        self.with_box_refine = with_box_refine
        self.matcher_alpha = matcher_alpha
        self.matcher_gamma = matcher_gamma
        self.matcher_class_cost = matcher_class_cost
        self.matcher_bbox_cost = matcher_bbox_cost
        self.matcher_giou_cost = matcher_giou_cost
        self.use_focal_loss = use_focal_loss
        self.auxiliary_loss = auxiliary_loss
        self.focal_loss_alpha = focal_loss_alpha
        self.focal_loss_gamma = focal_loss_gamma
        self.weight_loss_vfl = weight_loss_vfl
        self.weight_loss_bbox = weight_loss_bbox
        self.weight_loss_giou = weight_loss_giou
        self.eos_coefficient = eos_coefficient
        super().__init__(is_encoder_decoder=is_encoder_decoder, **kwargs)
