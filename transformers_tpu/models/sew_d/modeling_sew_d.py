"""SEW-D (reference models/sew_d/modeling_sew_d.py).

SEW's squeezed audio pipeline — strided positional conv + average pool
downsample time by ``squeeze_factor``, upsample restores it (:314-392) —
with a DeBERTa-v2 disentangled-attention transformer as the inner encoder
(:626+, shared-key c2p/p2c with bucketed relative positions and a
LayerNorm'd relative embedding table). The feature path LayerNorm uses
``feature_layer_norm_eps``; the transformer uses ``layer_norm_eps`` (1e-7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ..deberta_v2.modeling_deberta_v2 import DebertaV2Encoder
from ..sew.modeling_sew import SEWPositionalConvEmbedding, SEWUpsampling
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2FeatureEncoder,
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
)


class SEWDConfig(PretrainedConfig):
    model_type = "sew-d"

    def __init__(self, vocab_size=32, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, squeeze_factor=2,
                 max_position_embeddings=512, position_buckets=256, share_att_key=True,
                 relative_attention=True, pos_att_type=("p2c", "c2p"),
                 norm_rel_ebd="layer_norm", hidden_act="gelu_python",
                 hidden_dropout=0.1, activation_dropout=0.1, attention_dropout=0.1,
                 feat_proj_dropout=0.0, final_dropout=0.1, initializer_range=0.02,
                 layer_norm_eps=1e-7, feature_layer_norm_eps=1e-5,
                 feat_extract_norm="group", feat_extract_activation="gelu",
                 conv_dim=(64, 128, 128, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512),
                 conv_stride=(5, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 1, 1),
                 conv_kernel=(10, 3, 1, 3, 1, 3, 1, 3, 1, 2, 1, 2, 1),
                 conv_bias=False, num_conv_pos_embeddings=128,
                 num_conv_pos_embedding_groups=16, apply_spec_augment=True,
                 mask_time_prob=0.05, mask_time_length=10, mask_time_min_masks=2,
                 mask_feature_prob=0.0, mask_feature_length=10, mask_feature_min_masks=0,
                 ctc_loss_reduction="mean", ctc_zero_infinity=False,
                 use_weighted_layer_sum=False, classifier_proj_size=256,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.squeeze_factor = squeeze_factor
        self.max_position_embeddings = max_position_embeddings
        self.position_buckets = position_buckets
        self.share_att_key = share_att_key
        self.relative_attention = relative_attention
        self.pos_att_type = list(pos_att_type)
        self.norm_rel_ebd = norm_rel_ebd
        self.hidden_act = hidden_act
        self.hidden_dropout = hidden_dropout
        self.activation_dropout = activation_dropout
        self.attention_dropout = attention_dropout
        self.feat_proj_dropout = feat_proj_dropout
        self.final_dropout = final_dropout
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.feature_layer_norm_eps = feature_layer_norm_eps
        self.feat_extract_norm = feat_extract_norm
        self.feat_extract_activation = feat_extract_activation
        self.conv_dim = list(conv_dim)
        self.conv_stride = list(conv_stride)
        self.conv_kernel = list(conv_kernel)
        self.conv_bias = conv_bias
        self.num_feat_extract_layers = len(self.conv_dim)
        self.num_conv_pos_embeddings = num_conv_pos_embeddings
        self.num_conv_pos_embedding_groups = num_conv_pos_embedding_groups
        self.apply_spec_augment = apply_spec_augment
        self.mask_time_prob = mask_time_prob
        self.mask_time_length = mask_time_length
        self.mask_time_min_masks = mask_time_min_masks
        self.mask_feature_prob = mask_feature_prob
        self.mask_feature_length = mask_feature_length
        self.mask_feature_min_masks = mask_feature_min_masks
        self.ctc_loss_reduction = ctc_loss_reduction
        self.ctc_zero_infinity = ctc_zero_infinity
        self.use_weighted_layer_sum = use_weighted_layer_sum
        self.classifier_proj_size = classifier_proj_size
        # DebertaV2Encoder knobs not present in SEW-D checkpoints
        self.conv_kernel_size = 0
        self.max_relative_positions = -1
        self.attention_head_size = hidden_size // num_attention_heads
        self.output_hidden_size = hidden_size
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class SEWDEncoder(Module):
    """Outer squeezed encoder: pos-conv + avg-pool -> DeBERTa-v2 transformer
    -> upsample (reference SEWDEncoder/SEWDTransformerEncoder)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.sq = config.squeeze_factor
        self.pos_conv_embed = SEWPositionalConvEmbedding(config, **kw)
        self.encoder = DebertaV2Encoder(config, **kw)
        self.upsample = SEWUpsampling(config, **kw)

    def __call__(self, params, hidden, attention_mask=None, output_hidden_states=False):
        b, n_in, c = hidden.shape
        max_len = n_in // self.sq
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
            out_lengths = attention_mask.sum(-1) // self.sq
            kv_valid = (jnp.arange(max_len)[None, :] < out_lengths[:, None]).astype(jnp.int32)
        else:
            kv_valid = jnp.ones((b, max_len), jnp.int32)
        x = jnp.swapaxes(hidden, 1, 2)
        pos = jnp.swapaxes(self.pos_conv_embed(params["pos_conv_embed"],
                                               jnp.swapaxes(x, 1, 2)), 1, 2)
        pooled = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, self.sq), (1, 1, self.sq), "VALID") / self.sq
        m = min(pos.shape[-1], pooled.shape[-1])
        h = jnp.swapaxes(pooled[..., :m] + pos[..., :m], 1, 2)
        h = self.encoder(params["encoder"], h, kv_valid[:, :m])
        h = self.upsample(params["upsample"], h)
        if h.shape[1] < n_in:
            h = jnp.pad(h, ((0, 0), (0, n_in - h.shape[1]), (0, 0)))
        return h, None


class SEWDModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_extractor = Wav2Vec2FeatureEncoder(config, **kw)
        self.layer_norm = LayerNorm(config.conv_dim[-1], config.feature_layer_norm_eps, **kw)
        self.project_features = config.conv_dim[-1] != config.hidden_size
        if self.project_features:
            self.feature_projection = Linear(
                config.conv_dim[-1], config.hidden_size, True, dtype=dtype,
                param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.encoder = SEWDEncoder(config, **kw)
        if config.apply_spec_augment:
            self.masked_spec_embed_size = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        if getattr(self, "masked_spec_embed_size", None):
            params["masked_spec_embed"] = jax.random.uniform(
                rng, (self.masked_spec_embed_size,), self.param_dtype)
        return params

    def __call__(self, params, input_values, attention_mask=None,
                 output_hidden_states=False) -> BaseModelOutput:
        from ..wav2vec2.modeling_wav2vec2 import feature_vector_attention_mask

        feats = self.feature_extractor(params["feature_extractor"],
                                       jnp.asarray(input_values, self.dtype))
        feats = jnp.swapaxes(feats, 1, 2)
        hidden = self.layer_norm(params["layer_norm"], feats)
        if self.project_features:
            hidden = self.feature_projection(params["feature_projection"], hidden)
        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_vector_attention_mask(self.config, attention_mask,
                                                      feats.shape[1])
        hidden, _ = self.encoder(params["encoder"], hidden, feat_mask,
                                 output_hidden_states)
        return BaseModelOutput(last_hidden_state=hidden)


class SEWDPreTrainedModel(PreTrainedModel):
    config_class = SEWDConfig
    base_model_prefix = "sew_d"
    main_input_name = "input_values"


class SEWDModelStandalone(SEWDPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.sew_d = SEWDModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.sew_d(params["sew_d"], input_values, **kwargs)


class SEWDForCTC(SEWDPreTrainedModel, Wav2Vec2ForCTC):
    base_attr = "sew_d"
    model_cls = SEWDModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForCTC.__init__(self, config, dtype=dtype, param_dtype=param_dtype)


class SEWDForSequenceClassification(SEWDPreTrainedModel, Wav2Vec2ForSequenceClassification):
    base_attr = "sew_d"
    model_cls = SEWDModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForSequenceClassification.__init__(self, config, dtype=dtype,
                                                   param_dtype=param_dtype)
