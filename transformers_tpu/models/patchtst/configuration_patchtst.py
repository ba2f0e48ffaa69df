"""PatchTST config (reference src/transformers/models/patchtst/configuration_patchtst.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PatchTSTConfig(PretrainedConfig):
    model_type = "patchtst"
    attribute_map = {"hidden_size": "d_model",
                     "num_attention_heads": "num_attention_heads",
                     "num_hidden_layers": "num_hidden_layers"}

    def __init__(self, num_input_channels=1, context_length=32,
                 distribution_output="student_t", loss="mse", patch_length=1,
                 patch_stride=1, num_hidden_layers=3, d_model=128,
                 num_attention_heads=4, share_embedding=True, channel_attention=False,
                 ffn_dim=512, norm_type="batchnorm", norm_eps=1e-5,
                 attention_dropout=0.0, positional_dropout=0.0, path_dropout=0.0,
                 ff_dropout=0.0, bias=True, activation_function="gelu", pre_norm=True,
                 positional_encoding_type="sincos", use_cls_token=False, init_std=0.02,
                 share_projection=True, scaling="std", do_mask_input=None,
                 mask_type="random", random_mask_ratio=0.5,
                 num_forecast_mask_patches=(2,), channel_consistent_masking=False,
                 unmasked_channel_indices=None, mask_value=0, pooling_type="mean",
                 head_dropout=0.0, prediction_length=24, num_targets=1,
                 output_range=None, num_parallel_samples=100, **kwargs):
        self.num_input_channels = num_input_channels
        self.context_length = context_length
        self.distribution_output = distribution_output
        self.loss = loss
        self.patch_length = patch_length
        self.patch_stride = patch_stride
        self.num_hidden_layers = num_hidden_layers
        self.d_model = d_model
        self.num_attention_heads = num_attention_heads
        self.share_embedding = share_embedding
        self.channel_attention = channel_attention
        self.ffn_dim = ffn_dim
        self.norm_type = norm_type
        self.norm_eps = norm_eps
        self.attention_dropout = attention_dropout
        self.positional_dropout = positional_dropout
        self.path_dropout = path_dropout
        self.ff_dropout = ff_dropout
        self.bias = bias
        self.activation_function = activation_function
        self.pre_norm = pre_norm
        self.positional_encoding_type = positional_encoding_type
        self.use_cls_token = use_cls_token
        self.init_std = init_std
        self.share_projection = share_projection
        self.scaling = scaling
        self.do_mask_input = do_mask_input
        self.mask_type = mask_type
        self.random_mask_ratio = random_mask_ratio
        self.num_forecast_mask_patches = list(num_forecast_mask_patches)
        self.channel_consistent_masking = channel_consistent_masking
        self.unmasked_channel_indices = unmasked_channel_indices
        self.mask_value = mask_value
        self.pooling_type = pooling_type
        self.head_dropout = head_dropout
        self.prediction_length = prediction_length
        self.num_targets = num_targets
        self.output_range = output_range
        self.num_parallel_samples = num_parallel_samples
        super().__init__(**kwargs)

    @property
    def num_patches(self):
        return (max(self.context_length, self.patch_length) - self.patch_length
                ) // self.patch_stride + 1
