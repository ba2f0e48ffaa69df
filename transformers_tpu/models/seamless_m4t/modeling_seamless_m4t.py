"""SeamlessM4T (reference models/seamless_m4t/modeling_seamless_m4t.py).

Massively-multilingual any-to-any translation, four sub-networks:

- **text encoder/decoder** (:1160-1884): NLLB-style pre-norm transformer,
  ``ffn.fc1/fc2`` + ``ffn_layer_norm`` / ``cross_attention`` naming, shared
  scaled word embeddings, pad-aware sinusoidal positions.
- **speech encoder** (:1446-1510): conformer stack (shared-math with
  wav2vec2-conformer: relative-position self-attention, GLU conv module
  with BatchNorm) over mel ``input_features``, a half-residual intermediate
  FFN, a stride-2 GLU conv adapter (:751-869), and a final LayerNorm.
- **text-to-unit (t2u) model** (:1885-2101): enc-dec transformer from
  decoder hidden states to discrete acoustic units.
- **unit vocoder** (:2102-2432): duration predictor (clamped
  ``round(expm1)`` repeats) + HiFi-GAN over [lang ‖ units ‖ speaker].

``SeamlessM4TModel`` routes text/speech input to the right encoder and can
emit text or (units → waveform) speech.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...configuration_utils import PretrainedConfig
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bart.modeling_bart import BartAttention
from ..m2m_100.modeling_m2m_100 import fairseq_sinusoid_table
from ..speecht5.modeling_speecht5 import HifiGanResidualBlock, _ConvTranspose1d
from ..wav2vec2_conformer.modeling_wav2vec2_conformer import (
    ConformerEncoderLayer,
    rel_positional_encoding,
)


class SeamlessM4TConfig(PretrainedConfig):
    model_type = "seamless_m4t"

    def __init__(self, vocab_size=256102, t2u_vocab_size=10082, hidden_size=1024,
                 initializer_range=0.02, layer_norm_eps=1e-5, use_cache=True,
                 max_position_embeddings=1024, is_encoder_decoder=True,
                 encoder_layerdrop=0.05, decoder_layerdrop=0.05, activation_function="relu",
                 dropout=0.1, attention_dropout=0.1, activation_dropout=0.0,
                 scale_embedding=True, encoder_layers=24, encoder_ffn_dim=8192,
                 encoder_attention_heads=16, decoder_layers=24, decoder_ffn_dim=8192,
                 decoder_attention_heads=16, decoder_start_token_id=3, max_new_tokens=256,
                 pad_token_id=0, bos_token_id=2, eos_token_id=3,
                 speech_encoder_layers=24, speech_encoder_attention_heads=16,
                 speech_encoder_intermediate_size=4096, speech_encoder_hidden_act="swish",
                 speech_encoder_dropout=0.0, add_adapter=True, speech_encoder_layerdrop=0.1,
                 feature_projection_input_dim=160, num_conv_pos_embeddings=128,
                 num_conv_pos_embedding_groups=16, adaptor_kernel_size=8, adaptor_stride=8,
                 adaptor_dropout=0.1, num_adapter_layers=1, position_embeddings_type="relative",
                 rotary_embedding_base=10000, max_source_positions=4096,
                 conv_depthwise_kernel_size=31, t2u_bos_token_id=0, t2u_pad_token_id=1,
                 t2u_eos_token_id=2, t2u_decoder_start_token_id=2, t2u_max_new_tokens=1024,
                 t2u_encoder_layers=6, t2u_encoder_ffn_dim=8192, t2u_encoder_attention_heads=16,
                 t2u_decoder_layers=6, t2u_decoder_ffn_dim=8192, t2u_decoder_attention_heads=16,
                 t2u_max_position_embeddings=4096, sampling_rate=16000,
                 upsample_initial_channel=512, upsample_rates=(5, 4, 4, 2, 2),
                 upsample_kernel_sizes=(11, 8, 8, 4, 4), resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                 leaky_relu_slope=0.1, unit_hifi_gan_vocab_size=10000, unit_embed_dim=1280,
                 lang_embed_dim=256, spkr_embed_dim=256, vocoder_num_langs=36,
                 vocoder_num_spkrs=200, variance_predictor_kernel_size=3,
                 var_pred_dropout=0.5, vocoder_offset=4, **kwargs):
        self.vocab_size = vocab_size
        self.t2u_vocab_size = t2u_vocab_size
        self.hidden_size = hidden_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.use_cache = use_cache
        self.max_position_embeddings = max_position_embeddings
        self.encoder_layerdrop = encoder_layerdrop
        self.decoder_layerdrop = decoder_layerdrop
        self.activation_function = activation_function
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.scale_embedding = scale_embedding
        self.encoder_layers = encoder_layers
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_layers = decoder_layers
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_attention_heads = decoder_attention_heads
        self.max_new_tokens = max_new_tokens
        self.speech_encoder_layers = speech_encoder_layers
        self.speech_encoder_attention_heads = speech_encoder_attention_heads
        self.speech_encoder_intermediate_size = speech_encoder_intermediate_size
        self.speech_encoder_hidden_act = speech_encoder_hidden_act
        self.speech_encoder_dropout = speech_encoder_dropout
        self.add_adapter = add_adapter
        self.speech_encoder_layerdrop = speech_encoder_layerdrop
        self.feature_projection_input_dim = feature_projection_input_dim
        self.num_conv_pos_embeddings = num_conv_pos_embeddings
        self.num_conv_pos_embedding_groups = num_conv_pos_embedding_groups
        self.adaptor_kernel_size = adaptor_kernel_size
        self.adaptor_stride = adaptor_stride
        self.adaptor_dropout = adaptor_dropout
        self.num_adapter_layers = num_adapter_layers
        self.position_embeddings_type = position_embeddings_type
        self.rotary_embedding_base = rotary_embedding_base
        self.max_source_positions = max_source_positions
        self.conv_depthwise_kernel_size = conv_depthwise_kernel_size
        self.t2u_bos_token_id = t2u_bos_token_id
        self.t2u_pad_token_id = t2u_pad_token_id
        self.t2u_eos_token_id = t2u_eos_token_id
        self.t2u_decoder_start_token_id = t2u_decoder_start_token_id
        self.t2u_max_new_tokens = t2u_max_new_tokens
        self.t2u_encoder_layers = t2u_encoder_layers
        self.t2u_encoder_ffn_dim = t2u_encoder_ffn_dim
        self.t2u_encoder_attention_heads = t2u_encoder_attention_heads
        self.t2u_decoder_layers = t2u_decoder_layers
        self.t2u_decoder_ffn_dim = t2u_decoder_ffn_dim
        self.t2u_decoder_attention_heads = t2u_decoder_attention_heads
        self.t2u_max_position_embeddings = t2u_max_position_embeddings
        self.sampling_rate = sampling_rate
        self.upsample_initial_channel = upsample_initial_channel
        self.upsample_rates = list(upsample_rates)
        self.upsample_kernel_sizes = list(upsample_kernel_sizes)
        self.resblock_kernel_sizes = list(resblock_kernel_sizes)
        self.resblock_dilation_sizes = [list(d) for d in resblock_dilation_sizes]
        self.leaky_relu_slope = leaky_relu_slope
        self.unit_hifi_gan_vocab_size = unit_hifi_gan_vocab_size
        self.unit_embed_dim = unit_embed_dim
        self.lang_embed_dim = lang_embed_dim
        self.spkr_embed_dim = spkr_embed_dim
        self.vocoder_num_langs = vocoder_num_langs
        self.vocoder_num_spkrs = vocoder_num_spkrs
        self.variance_predictor_kernel_size = variance_predictor_kernel_size
        self.var_pred_dropout = var_pred_dropout
        self.vocoder_offset = vocoder_offset
        self.model_in_dim = unit_embed_dim + lang_embed_dim + spkr_embed_dim
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         decoder_start_token_id=decoder_start_token_id,
                         is_encoder_decoder=is_encoder_decoder, **kwargs)


class _SpeechCfgView:
    """Adapter exposing speech_* config fields under the conformer names."""

    def __init__(self, config):
        self.hidden_size = config.hidden_size
        self.num_attention_heads = config.speech_encoder_attention_heads
        self.intermediate_size = config.speech_encoder_intermediate_size
        self.hidden_act = config.speech_encoder_hidden_act
        self.conv_depthwise_kernel_size = config.conv_depthwise_kernel_size
        self.position_embeddings_type = config.position_embeddings_type
        self.rotary_embedding_base = config.rotary_embedding_base
        self.max_source_positions = config.max_source_positions
        self.initializer_range = config.initializer_range
        self.layer_norm_eps = config.layer_norm_eps


# --------------------------------------------------------------- text stack
class SeamlessM4TFFN(Module):
    def __init__(self, config, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, ffn_dim, True, **kw)
        self.fc2 = Linear(ffn_dim, config.hidden_size, True, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class SeamlessM4TEncoderLayer(Module):
    def __init__(self, config, ffn_dim, heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        cfg_view = type("C", (), {"init_std": config.initializer_range,
                                  "attn_implementation": getattr(config, "attn_implementation", None)})()
        self.self_attn = BartAttention(d, heads, cfg_view, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.ffn = SeamlessM4TFFN(config, ffn_dim, **kw)
        self.ffn_layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, hidden, attn_args):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, _ = self.self_attn(params["self_attn"], h, attn_args)
        hidden = hidden + h
        h = self.ffn_layer_norm(params["ffn_layer_norm"], hidden)
        return hidden + self.ffn(params["ffn"], h)


class SeamlessM4TDecoderLayer(Module):
    def __init__(self, config, ffn_dim, heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        cfg_view = type("C", (), {"init_std": config.initializer_range,
                                  "attn_implementation": getattr(config, "attn_implementation", None)})()
        self.self_attn = BartAttention(d, heads, cfg_view, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.cross_attention = BartAttention(d, heads, cfg_view, **kw)
        self.cross_attention_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.ffn = SeamlessM4TFFN(config, ffn_dim, **kw)
        self.ffn_layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache,
                 layer_idx, cache_position):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, attn_args, cache=cache,
                                  layer_idx=layer_idx, cache_position=cache_position)
        hidden = hidden + h
        h = self.cross_attention_layer_norm(params["cross_attention_layer_norm"], hidden)
        h, _ = self.cross_attention(params["cross_attention"], h, cross_args,
                                    kv_precomputed=cross_kv)
        hidden = hidden + h
        h = self.ffn_layer_norm(params["ffn_layer_norm"], hidden)
        return hidden + self.ffn(params["ffn"], h), cache


class SeamlessM4TSinusoidalPositions(Module):
    OFFSET = 2

    def __init__(self, num_positions, dim, padding_idx, **kw):
        kw.pop("embedding_init", None)
        super().__init__(**kw)
        self.table = fairseq_sinusoid_table(num_positions + self.OFFSET, dim, padding_idx)

    def init(self, rng):
        return {}

    def __call__(self, params, positions):
        return jnp.take(jnp.asarray(self.table, self.dtype), positions, axis=0)


class SeamlessM4TEncoder(Module):
    """Text (or t2u) encoder: scaled embeds + sinusoid positions + pre-norm
    layers + final layer_norm. ``is_t2u_encoder`` consumes embeds directly."""

    def __init__(self, config, *, dtype, param_dtype, layers=None, ffn_dim=None,
                 heads=None, is_t2u_encoder=False):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.is_t2u_encoder = is_t2u_encoder
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0
        if not is_t2u_encoder:
            self.embed_positions = SeamlessM4TSinusoidalPositions(
                config.max_position_embeddings, d, config.pad_token_id, **kw)
        self.layers = [SeamlessM4TEncoderLayer(
            config, ffn_dim or config.encoder_ffn_dim,
            heads or config.encoder_attention_heads, **kw)
            for _ in range(layers or config.encoder_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, inputs_embeds, attention_mask=None, position_ids=None):
        b, s, _ = inputs_embeds.shape
        h = inputs_embeds * self.embed_scale
        if not self.is_t2u_encoder:
            if position_ids is None:
                if attention_mask is None:
                    position_ids = (jnp.arange(1, s + 1, dtype=jnp.int32)[None, :]
                                    + self.config.pad_token_id)
                else:
                    m = attention_mask.astype(jnp.int32)
                    position_ids = jnp.cumsum(m, -1) * m + self.config.pad_token_id
            h = h + self.embed_positions({}, position_ids)
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
        return self.layer_norm(params["layer_norm"], h)


class SeamlessM4TDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype, layers=None, ffn_dim=None,
                 heads=None, max_positions=None):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0
        self.embed_positions = SeamlessM4TSinusoidalPositions(
            max_positions or config.max_position_embeddings, d, config.pad_token_id, **kw)
        self.layers = [SeamlessM4TDecoderLayer(
            config, ffn_dim or config.decoder_ffn_dim,
            heads or config.decoder_attention_heads, **kw)
            for _ in range(layers or config.decoder_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, inputs_embeds, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        b, s, _ = inputs_embeds.shape
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        pos_ids = positions[None, :] + self.config.pad_token_id + 1
        h = inputs_embeds * self.embed_scale + self.embed_positions({}, pos_ids)
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.broadcast_to(positions[None, :], (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.layers):
            h, cache = layer(params["layers"][str(i)], h, attn_args, cross_args,
                             cross_kv[i], cache, i, cache_position)
        return self.layer_norm(params["layer_norm"], h), cache


# -------------------------------------------------------------- speech stack
class SeamlessM4TConformerAdapterLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        k, s = config.adaptor_kernel_size, config.adaptor_stride
        self.stride = s
        self.residual_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.residual_conv = Conv(d, 2 * d, k, stride=s, padding=s // 2,
                                  use_bias=True, ndim=1, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.self_attn_conv = Conv(d, 2 * d, k, stride=s, padding=s // 2,
                                   use_bias=True, ndim=1, **kw)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        attn = Module(**kw)
        attn.linear_q = Linear(d, d, True, **lkw)
        attn.linear_k = Linear(d, d, True, **lkw)
        attn.linear_v = Linear(d, d, True, **lkw)
        attn.linear_out = Linear(d, d, True, **lkw)
        self.self_attn = attn
        self.num_heads = config.speech_encoder_attention_heads
        self.ffn_layer_norm = LayerNorm(d, 1e-5, **kw)
        ffn = Module(**kw)
        ffn.intermediate_dense = Linear(d, config.speech_encoder_intermediate_size, True, **lkw)
        ffn.output_dense = Linear(config.speech_encoder_intermediate_size, d, True, **lkw)
        self.ffn = ffn
        self.ffn_act = get_activation("relu")

    def _glu_conv(self, conv, params, x):
        y = conv(params, jnp.swapaxes(x, 1, 2))
        a, g = jnp.split(y, 2, axis=1)
        return jnp.swapaxes(a * jax.nn.sigmoid(g), 1, 2)

    def _attend(self, params, x):
        b, s, d = x.shape
        hd = d // self.num_heads
        q = self.self_attn.linear_q(params["linear_q"], x).reshape(b, s, self.num_heads, hd)
        k = self.self_attn.linear_k(params["linear_k"], x).reshape(b, s, self.num_heads, hd)
        v = self.self_attn.linear_v(params["linear_v"], x).reshape(b, s, self.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.self_attn.linear_out(params["linear_out"], out)

    def __call__(self, params, hidden):
        residual = self.residual_layer_norm(params["residual_layer_norm"], hidden)
        residual = self._glu_conv(self.residual_conv, params["residual_conv"], residual)
        x = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        x = self._glu_conv(self.self_attn_conv, params["self_attn_conv"], x)
        x = self._attend(params["self_attn"], x)
        hidden = x + residual
        residual = hidden
        x = self.ffn_layer_norm(params["ffn_layer_norm"], hidden)
        x = self.ffn.output_dense(params["ffn"]["output_dense"], self.ffn_act(
            self.ffn.intermediate_dense(params["ffn"]["intermediate_dense"], x)))
        return x + residual


class SeamlessM4TSpeechEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        view = _SpeechCfgView(config)
        fp = Module(**kw)
        fp.layer_norm = LayerNorm(config.feature_projection_input_dim,
                                  config.layer_norm_eps, **kw)
        fp.projection = Linear(config.feature_projection_input_dim, config.hidden_size,
                               True, kernel_init=normal_init(config.initializer_range), **kw)
        self.feature_projection = fp
        encoder = Module(**kw)
        encoder.layers = [ConformerEncoderLayer(view, **kw)
                          for _ in range(config.speech_encoder_layers)]
        encoder.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.encoder = encoder
        ffn = Module(**kw)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        ffn.intermediate_dense = Linear(config.hidden_size,
                                        config.speech_encoder_intermediate_size, True, **lkw)
        ffn.output_dense = Linear(config.speech_encoder_intermediate_size,
                                  config.hidden_size, True, **lkw)
        self.intermediate_ffn = ffn
        if config.add_adapter:
            adapter = Module(**kw)
            adapter.layers = [SeamlessM4TConformerAdapterLayer(config, **kw)
                              for _ in range(config.num_adapter_layers)]
            self.adapter = adapter
        else:
            self.adapter = None
        self.inner_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, input_features, attention_mask=None):
        fp = params["feature_projection"]
        h = self.feature_projection.layer_norm(fp["layer_norm"],
                                               jnp.asarray(input_features, self.dtype))
        h = self.feature_projection.projection(fp["projection"], h)
        mask_bias = None
        if attention_mask is not None:
            h = h * attention_mask[..., None].astype(h.dtype)
            mask_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                         * jnp.finfo(jnp.float32).min)
        s = h.shape[1]
        if self.config.position_embeddings_type == "relative":
            rel = jnp.asarray(rel_positional_encoding(s, self.config.hidden_size), self.dtype)
        else:
            rel = None
        for i, layer in enumerate(self.encoder.layers):
            h = layer(params["encoder"]["layers"][str(i)], h, mask_bias, rel)
        h = self.encoder.layer_norm(params["encoder"]["layer_norm"], h)
        ffn = params["intermediate_ffn"]
        expanded = self.intermediate_ffn.output_dense(
            ffn["output_dense"], jax.nn.relu(
                self.intermediate_ffn.intermediate_dense(ffn["intermediate_dense"], h)))
        h = h + 0.5 * expanded
        if self.adapter is not None:
            for i, layer in enumerate(self.adapter.layers):
                h = layer(params["adapter"]["layers"][str(i)], h)
        return self.inner_layer_norm(params["inner_layer_norm"], h)


# ------------------------------------------------------------------ vocoder
class SeamlessM4TVariancePredictor(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.unit_embed_dim
        k = config.variance_predictor_kernel_size
        self.conv1 = Conv(d, d, k, padding=(k - 1) // 2, use_bias=True, ndim=1, **kw)
        self.ln1 = LayerNorm(d, 1e-5, **kw)
        self.conv2 = Conv(d, d, k, padding=(k - 1) // 2, use_bias=True, ndim=1, **kw)
        self.ln2 = LayerNorm(d, 1e-5, **kw)
        self.proj = Linear(d, 1, True, kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, x):  # [B, T, C] -> [B, T]
        h = jnp.swapaxes(self.conv1(params["conv1"], jnp.swapaxes(x, 1, 2)), 1, 2)
        h = self.ln1(params["ln1"], jax.nn.relu(h))
        h = jnp.swapaxes(self.conv2(params["conv2"], jnp.swapaxes(h, 1, 2)), 1, 2)
        h = self.ln2(params["ln2"], jax.nn.relu(h))
        return self.proj(params["proj"], h)[..., 0]


class SeamlessM4THifiGan(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.slope = config.leaky_relu_slope
        self.num_kernels = len(config.resblock_kernel_sizes)
        self.num_upsamples = len(config.upsample_rates)
        self.conv_pre = Conv(config.model_in_dim, config.upsample_initial_channel, 7,
                             padding=3, ndim=1, **kw)
        ups = []
        for i, (rate, k) in enumerate(zip(config.upsample_rates,
                                          config.upsample_kernel_sizes)):
            ups.append(_ConvTranspose1d(
                config.upsample_initial_channel // (2 ** i),
                config.upsample_initial_channel // (2 ** (i + 1)),
                k, rate, (k - rate) // 2, **kw))
        self.upsampler = ups
        blocks = []
        for i in range(len(ups)):
            ch = config.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(config.resblock_kernel_sizes, config.resblock_dilation_sizes):
                blocks.append(HifiGanResidualBlock(ch, k, d, self.slope, **kw))
        self.resblocks = blocks
        self.conv_post = Conv(ch, 1, 7, padding=3, ndim=1, **kw)

    def __call__(self, params, x):  # [B, model_in_dim, T]
        x = self.conv_pre(params["conv_pre"], x)
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, self.slope)
            x = self.upsampler[i](params["upsampler"][str(i)], x)
            res = self.resblocks[i * self.num_kernels](
                params["resblocks"][str(i * self.num_kernels)], x)
            for j in range(1, self.num_kernels):
                res = res + self.resblocks[i * self.num_kernels + j](
                    params["resblocks"][str(i * self.num_kernels + j)], x)
            x = res / self.num_kernels
        x = jax.nn.leaky_relu(x, 0.01)
        x = jnp.tanh(self.conv_post(params["conv_post"], x))
        return x[:, 0]


class SeamlessM4TCodeHifiGan(PreTrainedModel):
    config_class = SeamlessM4TConfig
    base_model_prefix = "vocoder"
    main_input_name = "input_ids"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.dur_predictor = SeamlessM4TVariancePredictor(config, **kw)
        self.unit_embedding = Embedding(config.unit_hifi_gan_vocab_size,
                                        config.unit_embed_dim, **ekw)
        self.speaker_embedding = Embedding(config.vocoder_num_spkrs,
                                           config.spkr_embed_dim, **ekw)
        self.language_embedding = Embedding(config.vocoder_num_langs,
                                            config.lang_embed_dim, **ekw)
        self.hifi_gan = SeamlessM4THifiGan(config, **kw)

    def __call__(self, params, input_ids, spkr_id, lang_id):
        units = self.unit_embedding(params["unit_embedding"], input_ids)  # [B, T, C]
        log_dur = self.dur_predictor(params["dur_predictor"], units)
        dur = np.maximum(np.round(np.expm1(np.asarray(log_dur))).astype(np.int64), 1)
        # host-side repeat_interleave (duration expansion is data-dependent)
        outs = []
        units_np = np.asarray(units)
        for b in range(units_np.shape[0]):
            outs.append(np.repeat(units_np[b], dur[b], axis=0))
        max_t = max(o.shape[0] for o in outs)
        expanded = np.zeros((len(outs), max_t, units_np.shape[-1]), units_np.dtype)
        for b, o in enumerate(outs):
            expanded[b, : o.shape[0]] = o
        expanded = jnp.asarray(expanded).transpose(0, 2, 1)  # [B, C, T]
        spkr = self.speaker_embedding(params["speaker_embedding"], spkr_id)
        lang = self.language_embedding(params["language_embedding"], lang_id)
        t = expanded.shape[-1]
        spkr = jnp.broadcast_to(jnp.swapaxes(spkr, 1, 2), (expanded.shape[0], spkr.shape[-1], t))
        lang = jnp.broadcast_to(jnp.swapaxes(lang, 1, 2), (expanded.shape[0], lang.shape[-1], t))
        x = jnp.concatenate([lang, expanded, spkr], axis=1)
        wav = self.hifi_gan(params["hifi_gan"], x)
        lengths = [int(d.sum()) for d in dur]
        return wav, lengths


# ------------------------------------------------------------- top models
class SeamlessM4TPreTrainedModel(PreTrainedModel):
    config_class = SeamlessM4TConfig
    base_model_prefix = "seamless_m4t"
    _keys_to_ignore_on_load_unexpected = (
        r"\.embed_tokens\.weight$", r"\.num_batches_tracked$", r"^lm_head\.weight$",
        r"\.embed_positions\.weights$")


class _SeamlessTextBase(SeamlessM4TPreTrainedModel, EncoderDecoderGenerationMixin):
    """Shared encode/decode plumbing for the text-output models."""

    def get_input_embedding_path(self):
        return "shared.weight"

    def _table(self, params):
        return params["shared"]["weight"]

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.text_decoder.layers):
            out.append(layer.cross_attention.kv(
                params["text_decoder"]["layers"][str(i)]["cross_attention"],
                encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        embeds = jnp.take(self._table(params).astype(self.dtype), input_ids, axis=0)
        return self.text_decoder(params["text_decoder"], embeds, cross_kv, cache,
                                 cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        return jnp.dot(hidden.astype(self.dtype), self._table(params).astype(self.dtype).T)

    def init_decoder_cache(self, batch_size, max_len, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.hidden_size // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, input_features=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params,
                                          input_ids if input_features is None else input_features,
                                          attention_mask)
        enc_mask = attention_mask
        if getattr(self, "_is_speech", False):
            enc_mask = None  # adapter strides change the time axis
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100,
                                          self.config.pad_token_id, decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, enc_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


class SeamlessM4TForTextToText(_SeamlessTextBase):
    main_input_name = "input_ids"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.hidden_size,
                                embedding_init=normal_init(config.initializer_range), **kw)
        self.text_encoder = SeamlessM4TEncoder(config, **kw)
        self.text_decoder = SeamlessM4TDecoder(config, **kw)

    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        embeds = self.shared(params["shared"], input_ids)
        hidden = self.text_encoder(params["text_encoder"], embeds, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)


class SeamlessM4TForSpeechToText(_SeamlessTextBase):
    main_input_name = "input_features"
    encoder_input_name = "input_features"
    _is_speech = True

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.hidden_size,
                                embedding_init=normal_init(config.initializer_range), **kw)
        self.speech_encoder = SeamlessM4TSpeechEncoder(config, **kw)
        self.text_decoder = SeamlessM4TDecoder(config, **kw)

    def encode(self, params, input_features, attention_mask=None) -> BaseModelOutput:
        hidden = self.speech_encoder(params["speech_encoder"], input_features,
                                     attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)


class SeamlessM4TTextToUnitForConditionalGeneration(SeamlessM4TPreTrainedModel,
                                                    EncoderDecoderGenerationMixin):
    """t2u enc-dec: encoder over text-decoder hidden states, unit decoder."""

    main_input_name = "inputs_embeds"
    encoder_input_name = "inputs_embeds"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        model = Module(**kw)
        model.encoder = SeamlessM4TEncoder(
            config, layers=config.t2u_encoder_layers, ffn_dim=config.t2u_encoder_ffn_dim,
            heads=config.t2u_encoder_attention_heads, is_t2u_encoder=True, **kw)
        model.decoder = SeamlessM4TDecoder(
            config, layers=config.t2u_decoder_layers, ffn_dim=config.t2u_decoder_ffn_dim,
            heads=config.t2u_decoder_attention_heads,
            max_positions=config.t2u_max_position_embeddings, **kw)
        model.decoder.embed_tokens = Embedding(
            config.t2u_vocab_size, config.hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        self.model = model
        self.lm_head = Linear(config.hidden_size, config.t2u_vocab_size, False,
                              kernel_init=normal_init(config.initializer_range), **kw)

    def encode(self, params, inputs_embeds, attention_mask=None) -> BaseModelOutput:
        hidden = self.model.encoder(params["model"]["encoder"], inputs_embeds,
                                    attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.model.decoder.layers):
            out.append(layer.cross_attention.kv(
                params["model"]["decoder"]["layers"][str(i)]["cross_attention"],
                encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        embeds = self.model.decoder.embed_tokens(
            params["model"]["decoder"]["embed_tokens"], input_ids)
        return self.model.decoder(params["model"]["decoder"], embeds, cross_kv, cache,
                                  cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        return self.lm_head(params["lm_head"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.t2u_decoder_layers, batch_size=batch_size,
                                 max_len=max_len,
                                 num_kv_heads=c.t2u_decoder_attention_heads,
                                 head_dim=c.hidden_size // c.t2u_decoder_attention_heads,
                                 dtype=dtype or self.dtype)

    def __call__(self, params, inputs_embeds=None, attention_mask=None,
                 decoder_input_ids=None, encoder_outputs=None, past_key_values=None,
                 cache_position=0, labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, inputs_embeds, attention_mask)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position, None,
                                         attention_mask)
        logits = self.compute_logits(params, hidden)
        return Seq2SeqLMOutput(logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


class SeamlessM4TModel(SeamlessM4TPreTrainedModel):
    """Full any-to-any model (reference :3581). ``generate`` routes by input
    modality and ``generate_speech`` runs text -> units -> waveform."""

    main_input_name = "input_ids"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.hidden_size,
                                embedding_init=normal_init(config.initializer_range), **kw)
        self.text_encoder = SeamlessM4TEncoder(config, **kw)
        self.speech_encoder = SeamlessM4TSpeechEncoder(config, **kw)
        self.text_decoder = SeamlessM4TDecoder(config, **kw)
        self.t2u_model = SeamlessM4TTextToUnitForConditionalGeneration(config, **kw)
        self.vocoder = SeamlessM4TCodeHifiGan(config, **kw)

    def get_input_embedding_path(self):
        return "shared.weight"

    def _text_view(self) -> SeamlessM4TForTextToText:
        view = SeamlessM4TForTextToText.__new__(SeamlessM4TForTextToText)
        PreTrainedModel.__init__(view, self.config, dtype=self.dtype,
                                 param_dtype=self.param_dtype)
        view.shared = self.shared
        view.text_encoder = self.text_encoder
        view.text_decoder = self.text_decoder
        return view

    def _speech_view(self) -> SeamlessM4TForSpeechToText:
        view = SeamlessM4TForSpeechToText.__new__(SeamlessM4TForSpeechToText)
        PreTrainedModel.__init__(view, self.config, dtype=self.dtype,
                                 param_dtype=self.param_dtype)
        view.shared = self.shared
        view.speech_encoder = self.speech_encoder
        view.text_decoder = self.text_decoder
        return view

    def __call__(self, params, input_ids=None, input_features=None, **kwargs):
        if input_features is not None:
            sub = self._speech_view()
            return sub(params, input_features=input_features, **kwargs)
        return self._text_view()(params, input_ids=input_ids, **kwargs)

    def generate(self, params, input_ids=None, input_features=None, **kwargs):
        if input_features is not None:
            return self._speech_view().generate(params, input_features=input_features,
                                                **kwargs)
        return self._text_view().generate(params, input_ids=input_ids, **kwargs)
