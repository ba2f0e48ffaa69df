"""DPT config (reference src/transformers/models/dpt/configuration_dpt.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DPTConfig(PretrainedConfig):
    model_type = "dpt"

    def __init__(self, hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-12, image_size=384, patch_size=16, num_channels=3,
                 is_hybrid=False, qkv_bias=True, backbone_out_indices=(2, 5, 8, 11),
                 readout_type="project", reassemble_factors=(4, 2, 1, 0.5),
                 neck_hidden_sizes=(96, 192, 384, 768), fusion_hidden_size=256,
                 head_in_index=-1, use_batch_norm_in_fusion_residual=False,
                 use_bias_in_fusion_residual=None, add_projection=False,
                 use_auxiliary_head=True, auxiliary_loss_weight=0.4,
                 semantic_loss_ignore_index=255, semantic_classifier_dropout=0.1,
                 backbone_featmap_shape=None, neck_ignore_stages=None,
                 backbone_config=None, backbone=None, use_pretrained_backbone=False,
                 use_timm_backbone=False, backbone_kwargs=None,
                 pooler_output_size=None, pooler_act="tanh", **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.is_hybrid = is_hybrid
        self.qkv_bias = qkv_bias
        self.backbone_out_indices = list(backbone_out_indices)
        self.readout_type = readout_type
        self.reassemble_factors = list(reassemble_factors)
        self.neck_hidden_sizes = list(neck_hidden_sizes)
        self.fusion_hidden_size = fusion_hidden_size
        self.head_in_index = head_in_index
        self.use_batch_norm_in_fusion_residual = use_batch_norm_in_fusion_residual
        self.use_bias_in_fusion_residual = use_bias_in_fusion_residual
        self.add_projection = add_projection
        self.use_auxiliary_head = use_auxiliary_head
        self.auxiliary_loss_weight = auxiliary_loss_weight
        self.semantic_loss_ignore_index = semantic_loss_ignore_index
        self.semantic_classifier_dropout = semantic_classifier_dropout
        self.backbone_featmap_shape = backbone_featmap_shape
        self.neck_ignore_stages = neck_ignore_stages or []
        self.backbone_config = backbone_config
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        self.pooler_output_size = pooler_output_size or hidden_size
        self.pooler_act = pooler_act
        super().__init__(**kwargs)
