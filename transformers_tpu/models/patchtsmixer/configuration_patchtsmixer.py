"""PatchTSMixer config (reference
models/patchtsmixer/configuration_patchtsmixer.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PatchTSMixerConfig(PretrainedConfig):
    model_type = "patchtsmixer"
    attribute_map = {"hidden_size": "d_model", "num_hidden_layers": "num_layers"}

    def __init__(self, context_length=32, patch_length=8, num_input_channels=1,
                 patch_stride=8, num_parallel_samples=100, d_model=8,
                 expansion_factor=2, num_layers=3, dropout=0.2, mode="common_channel",
                 gated_attn=True, norm_mlp="LayerNorm", self_attn=False,
                 self_attn_heads=1, use_positional_encoding=False,
                 positional_encoding_type="sincos", scaling="std",
                 loss="mse", init_std=0.02, post_init=False, norm_eps=1e-5,
                 mask_type="random", random_mask_ratio=0.5, num_forecast_mask_patches=2,
                 mask_value=0, masked_loss=True, channel_consistent_masking=True,
                 unmasked_channel_indices=None, head_dropout=0.2,
                 distribution_output="student_t", prediction_length=16,
                 prediction_channel_indices=None, num_targets=3,
                 output_range=None, head_aggregation="max_pool", **kwargs):
        self.context_length = context_length
        self.patch_length = patch_length
        self.num_input_channels = num_input_channels
        self.patch_stride = patch_stride
        self.num_parallel_samples = num_parallel_samples
        self.d_model = d_model
        self.expansion_factor = expansion_factor
        self.num_layers = num_layers
        self.dropout = dropout
        self.mode = mode
        self.gated_attn = gated_attn
        self.norm_mlp = norm_mlp
        self.self_attn = self_attn
        self.self_attn_heads = self_attn_heads
        self.use_positional_encoding = use_positional_encoding
        self.positional_encoding_type = positional_encoding_type
        self.scaling = scaling
        self.loss = loss
        self.init_std = init_std
        self.post_init = post_init
        self.norm_eps = norm_eps
        self.mask_type = mask_type
        self.random_mask_ratio = random_mask_ratio
        self.num_forecast_mask_patches = num_forecast_mask_patches
        self.mask_value = mask_value
        self.masked_loss = masked_loss
        self.channel_consistent_masking = channel_consistent_masking
        self.unmasked_channel_indices = unmasked_channel_indices
        self.head_dropout = head_dropout
        self.distribution_output = distribution_output
        self.prediction_length = prediction_length
        self.prediction_channel_indices = prediction_channel_indices
        self.num_targets = num_targets
        self.output_range = output_range
        self.head_aggregation = head_aggregation
        self.num_patches = (max(context_length, patch_length)
                            - patch_length) // patch_stride + 1
        super().__init__(**kwargs)
