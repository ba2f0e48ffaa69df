"""Wav2Vec2-Conformer (reference models/wav2vec2_conformer/modeling_wav2vec2_conformer.py).

Wav2Vec2 conv feature stack + Conformer blocks: two half-residual
feed-forwards sandwiching self-attention and a GLU depthwise conv module
with BatchNorm (:568-630). Attention optionally adds Transformer-XL
relative position terms with the pad-shift trick (``pos_bias_u/v``,
:512-565) or applies rotary embeddings to the joint q/k stream (:489-510).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import BatchNorm, Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2FeatureEncoder,
    Wav2Vec2FeatureProjection,
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
    Wav2Vec2PositionalConvEmbedding,
)


class Wav2Vec2ConformerConfig(Wav2Vec2Config):
    model_type = "wav2vec2-conformer"

    def __init__(self, position_embeddings_type="relative", rotary_embedding_base=10000,
                 max_source_positions=5000, conv_depthwise_kernel_size=31, **kwargs):
        self.position_embeddings_type = position_embeddings_type
        self.rotary_embedding_base = rotary_embedding_base
        self.max_source_positions = max_source_positions
        self.conv_depthwise_kernel_size = conv_depthwise_kernel_size
        super().__init__(**kwargs)


def rel_positional_encoding(seq_len: int, d_model: int) -> np.ndarray:
    """[1, 2T-1, C] positive+negative sinusoid table (reference :159-206)."""
    position = np.arange(seq_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((seq_len, d_model))
    pe_neg = np.zeros((seq_len, d_model))
    pe_pos[:, 0::2] = np.sin(position * div)
    pe_pos[:, 1::2] = np.cos(position * div)
    pe_neg[:, 0::2] = np.sin(-position * div)
    pe_neg[:, 1::2] = np.cos(-position * div)
    pe_pos = pe_pos[::-1][None]
    pe_neg = pe_neg[1:][None]
    return np.concatenate([pe_pos, pe_neg], axis=1)


class ConformerSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // config.num_attention_heads
        self.pos_type = config.position_embeddings_type
        self.linear_q = Linear(h, h, True, **kw)
        self.linear_k = Linear(h, h, True, **kw)
        self.linear_v = Linear(h, h, True, **kw)
        self.linear_out = Linear(h, h, True, **kw)
        if self.pos_type == "relative":
            self.linear_pos = Linear(h, h, False, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.pos_type == "relative":
            params["pos_bias_u"] = jnp.zeros((self.num_heads, self.head_dim),
                                             self.param_dtype)
            params["pos_bias_v"] = jnp.zeros((self.num_heads, self.head_dim),
                                             self.param_dtype)
        return params

    def _rotary(self, x, rel):
        b, s, _ = x.shape
        x = x.reshape(b, s, self.num_heads, self.head_dim)
        cos = rel[0, :s]  # [S, D]
        sin = rel[1, :s]
        half = self.head_dim // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        x = x * cos[None, :, None, :] + rot * sin[None, :, None, :]
        return x.reshape(b, s, -1)

    def __call__(self, params, hidden, mask_bias, rel):
        b, s, h = hidden.shape
        qk_in = hidden
        if self.pos_type == "rotary":
            qk_in = self._rotary(hidden, rel)
        q = self.linear_q(params["linear_q"], qk_in).reshape(b, s, self.num_heads, self.head_dim)
        k = self.linear_k(params["linear_k"], qk_in).reshape(b, s, self.num_heads, self.head_dim)
        v = self.linear_v(params["linear_v"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if self.pos_type == "relative":
            pos = self.linear_pos(params["linear_pos"], rel)  # [1, 2S-1, H*D]
            pos = pos.reshape(1, -1, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
            qu = q + params["pos_bias_u"].astype(q.dtype)[None, :, None, :]
            qv = q + params["pos_bias_v"].astype(q.dtype)[None, :, None, :]
            scores_ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
            scores_bd = jnp.einsum("bhqd,xhrd->bhqr", qv, pos)  # [B,H,S,2S-1]
            # pad-shift trick (reference :540-549)
            zero = jnp.zeros((*scores_bd.shape[:3], 1), scores_bd.dtype)
            padded = jnp.concatenate([zero, scores_bd], axis=-1)
            padded = padded.reshape(*scores_bd.shape[:2],
                                    scores_bd.shape[3] + 1, scores_bd.shape[2])
            scores_bd = padded[:, :, 1:].reshape(scores_bd.shape)
            scores_bd = scores_bd[..., : scores_bd.shape[-1] // 2 + 1]
            scores = (scores_ac + scores_bd) / math.sqrt(self.head_dim)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.head_dim)
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h)
        return self.linear_out(params["linear_out"], out)


class ConformerConvolutionModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        k = config.conv_depthwise_kernel_size
        self.layer_norm = LayerNorm(h, dtype=dtype, param_dtype=param_dtype)
        self.pointwise_conv1 = Conv(h, 2 * h, 1, use_bias=False, ndim=1, **kw)
        self.depthwise_conv = Conv(h, h, k, stride=1, padding=(k - 1) // 2,
                                   groups=h, use_bias=False, ndim=1, **kw)
        self.batch_norm = BatchNorm(h, 1e-5, **kw)
        self.pointwise_conv2 = Conv(h, h, 1, use_bias=False, ndim=1, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        x = self.layer_norm(params["layer_norm"], hidden)
        x = jnp.swapaxes(x, 1, 2)  # [B, C, T]
        x = self.pointwise_conv1(params["pointwise_conv1"], x)
        a, g = jnp.split(x, 2, axis=1)
        x = a * jax.nn.sigmoid(g)  # GLU over channels
        x = self.depthwise_conv(params["depthwise_conv"], x)
        x = self.batch_norm(params["batch_norm"], x)
        x = self.act(x)
        x = self.pointwise_conv2(params["pointwise_conv2"], x)
        return jnp.swapaxes(x, 1, 2)


class ConformerFeedForward(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.intermediate_dense = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.output_dense = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.output_dense(params["output_dense"],
                                 self.act(self.intermediate_dense(params["intermediate_dense"], x)))


class ConformerEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.ffn1_layer_norm = LayerNorm(h, **kw)
        self.ffn1 = ConformerFeedForward(config, **kw)
        self.self_attn_layer_norm = LayerNorm(h, **kw)
        self.self_attn = ConformerSelfAttention(config, **kw)
        self.conv_module = ConformerConvolutionModule(config, **kw)
        self.ffn2_layer_norm = LayerNorm(h, **kw)
        self.ffn2 = ConformerFeedForward(config, **kw)
        self.final_layer_norm = LayerNorm(h, **kw)

    def __call__(self, params, hidden, mask_bias, rel):
        h = self.ffn1(params["ffn1"], self.ffn1_layer_norm(params["ffn1_layer_norm"], hidden))
        hidden = h * 0.5 + hidden
        h = self.self_attn(params["self_attn"],
                           self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden),
                           mask_bias, rel)
        hidden = h + hidden
        hidden = self.conv_module(params["conv_module"], hidden) + hidden
        h = self.ffn2(params["ffn2"], self.ffn2_layer_norm(params["ffn2_layer_norm"], hidden))
        hidden = h * 0.5 + hidden
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class Wav2Vec2ConformerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.pos_conv_embed = Wav2Vec2PositionalConvEmbedding(config, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layers = [ConformerEncoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attention_mask=None, output_hidden_states=False):
        mask_bias = None
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
            mask_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                         * jnp.finfo(jnp.float32).min)
        s = hidden.shape[1]
        if self.config.position_embeddings_type == "relative":
            rel = jnp.asarray(rel_positional_encoding(s, self.config.hidden_size),
                              self.dtype)
        elif self.config.position_embeddings_type == "rotary":
            dim = self.config.hidden_size // self.config.num_attention_heads
            base = self.config.rotary_embedding_base
            inv = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
            t = np.arange(s, dtype=np.float64)
            freqs = np.einsum("i,j->ij", t, inv)
            emb = np.concatenate([freqs, freqs], axis=-1)
            rel = jnp.asarray(np.stack([np.cos(emb), np.sin(emb)]), self.dtype)
        else:
            rel = None
        # NB the conformer encoder never ADDS pos_conv_embed — the module
        # exists in checkpoints but relative/rotary tables carry positions
        # (reference Wav2Vec2ConformerEncoder.forward); final LayerNorm runs
        # AFTER the block stack.
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layers"][str(i)], hidden, mask_bias, rel)
        hidden = self.layer_norm(params["layer_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class Wav2Vec2ConformerModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_extractor = Wav2Vec2FeatureEncoder(config, **kw)
        self.feature_projection = Wav2Vec2FeatureProjection(config, **kw)
        self.encoder = Wav2Vec2ConformerEncoder(config, **kw)
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
        hidden = self.feature_projection(params["feature_projection"], feats)
        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_vector_attention_mask(self.config, attention_mask,
                                                      feats.shape[1])
        hidden, all_hidden = self.encoder(params["encoder"], hidden, feat_mask,
                                          output_hidden_states)
        return BaseModelOutput(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class Wav2Vec2ConformerPreTrainedModel(PreTrainedModel):
    config_class = Wav2Vec2ConformerConfig
    base_model_prefix = "wav2vec2_conformer"
    main_input_name = "input_values"
    _keys_to_ignore_on_load_unexpected = (r"quantizer\.", r"project_q\.", r"project_hid\.")


class Wav2Vec2ConformerModelStandalone(Wav2Vec2ConformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.wav2vec2_conformer = Wav2Vec2ConformerModel(config, dtype=self.dtype,
                                                         param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.wav2vec2_conformer(params["wav2vec2_conformer"], input_values, **kwargs)


class Wav2Vec2ConformerForCTC(Wav2Vec2ForCTC):
    config_class = Wav2Vec2ConformerConfig
    base_model_prefix = "wav2vec2_conformer"
    base_attr = "wav2vec2_conformer"
    model_cls = Wav2Vec2ConformerModel
    _keys_to_ignore_on_load_unexpected = Wav2Vec2ConformerPreTrainedModel._keys_to_ignore_on_load_unexpected


class Wav2Vec2ConformerForSequenceClassification(Wav2Vec2ForSequenceClassification):
    config_class = Wav2Vec2ConformerConfig
    base_model_prefix = "wav2vec2_conformer"
    base_attr = "wav2vec2_conformer"
    model_cls = Wav2Vec2ConformerModel
    _keys_to_ignore_on_load_unexpected = Wav2Vec2ConformerPreTrainedModel._keys_to_ignore_on_load_unexpected
