"""SeamlessM4T-v2 (reference models/seamless_m4t_v2/modeling_seamless_m4t_v2.py).

v2 keeps the v1 text encoder/decoder verbatim and swaps the speech side:
the conformer uses ``relative_key`` learned-distance attention (:359-441),
a CAUSAL GLU conv module with LayerNorm (:288-357), and CHUNKED attention —
each position attends its own ``speech_encoder_chunk_size`` chunk plus
``speech_encoder_left_chunk_num`` previous chunks (:560-590). The t2u model
becomes non-autoregressive (char upsampling by a duration predictor); the
unit vocoder keeps the v1 duration + HiFi-GAN structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..seamless_m4t.modeling_seamless_m4t import (
    SeamlessM4TCodeHifiGan,
    SeamlessM4TConfig,
    SeamlessM4TDecoder,
    SeamlessM4TEncoder,
    SeamlessM4TForTextToText,
    _SeamlessTextBase,
)
from ..wav2vec2_bert.modeling_wav2vec2_bert import (
    Wav2Vec2BertConfig,
    Wav2Vec2BertEncoderLayer,
)


class SeamlessM4Tv2Config(SeamlessM4TConfig):
    model_type = "seamless_m4t_v2"

    def __init__(self, position_embeddings_type="relative_key",
                 left_max_position_embeddings=64, right_max_position_embeddings=8,
                 speech_encoder_chunk_size=20000, speech_encoder_left_chunk_num=128,
                 t2u_variance_predictor_embed_dim=1024,
                 t2u_variance_predictor_hidden_dim=256,
                 t2u_variance_predictor_kernel_size=3, t2u_variance_pred_dropout=0.5,
                 char_vocab_size=10943, **kwargs):
        self.left_max_position_embeddings = left_max_position_embeddings
        self.right_max_position_embeddings = right_max_position_embeddings
        self.speech_encoder_chunk_size = speech_encoder_chunk_size
        self.speech_encoder_left_chunk_num = speech_encoder_left_chunk_num
        self.t2u_variance_predictor_embed_dim = t2u_variance_predictor_embed_dim
        self.t2u_variance_predictor_hidden_dim = t2u_variance_predictor_hidden_dim
        self.t2u_variance_predictor_kernel_size = t2u_variance_predictor_kernel_size
        self.t2u_variance_pred_dropout = t2u_variance_pred_dropout
        self.char_vocab_size = char_vocab_size
        kwargs.setdefault("position_embeddings_type", position_embeddings_type)
        super().__init__(**kwargs)


class _V2SpeechCfgView(Wav2Vec2BertConfig):
    """w2v-BERT layer view over the v2 speech_* config fields."""

    def __init__(self, config):
        super().__init__(
            hidden_size=config.hidden_size,
            num_hidden_layers=config.speech_encoder_layers,
            num_attention_heads=config.speech_encoder_attention_heads,
            intermediate_size=config.speech_encoder_intermediate_size,
            hidden_act=config.speech_encoder_hidden_act,
            feature_projection_input_dim=config.feature_projection_input_dim,
            position_embeddings_type=config.position_embeddings_type,
            left_max_position_embeddings=config.left_max_position_embeddings,
            right_max_position_embeddings=config.right_max_position_embeddings,
            conv_depthwise_kernel_size=config.conv_depthwise_kernel_size,
            layer_norm_eps=config.layer_norm_eps,
            initializer_range=config.initializer_range,
            apply_spec_augment=False, mask_time_prob=0.0, mask_feature_prob=0.0)


def chunk_mask_bias(seq_len: int, chunk_size: int, left_chunks: int) -> jnp.ndarray:
    """[1, 1, S, S] additive mask restricting attention to the own chunk and
    ``left_chunks`` previous chunks (reference _apply_chunk_attention)."""
    idx = np.arange(seq_len)
    chunk = idx // chunk_size
    start = np.maximum(chunk - left_chunks, 0) * chunk_size if left_chunks >= 0 \
        else np.zeros_like(chunk)
    end = np.minimum((chunk + 1) * chunk_size, seq_len)
    cols = idx[None, :]
    blocked = (cols < start[:, None]) | (cols >= end[:, None])
    bias = np.where(blocked, np.finfo(np.float32).min, 0.0)
    return jnp.asarray(bias[None, None], jnp.float32)


class SeamlessM4Tv2ConformerAdapterLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        k, s = config.adaptor_kernel_size, config.adaptor_stride
        self.num_heads = config.speech_encoder_attention_heads
        self.residual_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.residual_conv = Conv(d, 2 * d, k, stride=s, padding=s // 2,
                                  use_bias=True, ndim=1, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.self_attn_conv = Conv(d, 2 * d, k, stride=s, padding=s // 2,
                                   use_bias=True, ndim=1, **kw)
        attn = Module(**kw)
        attn.linear_q = Linear(d, d, True, **lkw)
        attn.linear_k = Linear(d, d, True, **lkw)
        attn.linear_v = Linear(d, d, True, **lkw)
        attn.linear_out = Linear(d, d, True, **lkw)
        self.self_attn = attn
        self.ffn_layer_norm = LayerNorm(d, 1e-5, **kw)
        ffn = Module(**kw)
        ffn.intermediate_dense = Linear(d, config.speech_encoder_intermediate_size,
                                        True, **lkw)
        ffn.output_dense = Linear(config.speech_encoder_intermediate_size, d, True, **lkw)
        self.ffn = ffn

    def _glu_conv(self, conv, params, x):
        y = conv(params, jnp.swapaxes(x, 1, 2))
        a, g = jnp.split(y, 2, axis=1)
        return jnp.swapaxes(a * jax.nn.sigmoid(g), 1, 2)

    def __call__(self, params, hidden):
        import math

        residual = self.residual_layer_norm(params["residual_layer_norm"], hidden)
        residual = self._glu_conv(self.residual_conv, params["residual_conv"], residual)
        x = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        x = self._glu_conv(self.self_attn_conv, params["self_attn_conv"], x)
        b, s, d = x.shape
        hd = d // self.num_heads
        q = self.self_attn.linear_q(params["self_attn"]["linear_q"], x).reshape(b, s, self.num_heads, hd)
        k = self.self_attn.linear_k(params["self_attn"]["linear_k"], x).reshape(b, s, self.num_heads, hd)
        v = self.self_attn.linear_v(params["self_attn"]["linear_v"], x).reshape(b, s, self.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        x = self.self_attn.linear_out(params["self_attn"]["linear_out"], out)
        hidden = x + residual
        residual = hidden
        x = self.ffn_layer_norm(params["ffn_layer_norm"], hidden)
        x = self.ffn.output_dense(params["ffn"]["output_dense"], jax.nn.relu(
            self.ffn.intermediate_dense(params["ffn"]["intermediate_dense"], x)))
        return x + residual


class SeamlessM4Tv2SpeechEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        view = _V2SpeechCfgView(config)
        fp = Module(**kw)
        fp.layer_norm = LayerNorm(config.feature_projection_input_dim,
                                  config.layer_norm_eps, **kw)
        fp.projection = Linear(config.feature_projection_input_dim, config.hidden_size,
                               True, kernel_init=normal_init(config.initializer_range), **kw)
        self.feature_projection = fp
        encoder = Module(**kw)
        encoder.layers = [Wav2Vec2BertEncoderLayer(view, **kw)
                          for _ in range(config.speech_encoder_layers)]
        self.encoder = encoder
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        ffn = Module(**kw)
        ffn.intermediate_dense = Linear(config.hidden_size,
                                        config.speech_encoder_intermediate_size, True, **lkw)
        ffn.output_dense = Linear(config.speech_encoder_intermediate_size,
                                  config.hidden_size, True, **lkw)
        self.intermediate_ffn = ffn
        if config.add_adapter:
            adapter = Module(**kw)
            adapter.layers = [SeamlessM4Tv2ConformerAdapterLayer(config, **kw)
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
        conv_mask = attention_mask
        if attention_mask is not None:
            h = h * attention_mask[..., None].astype(h.dtype)
            mask_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                         * jnp.finfo(jnp.float32).min)
        if self.config.speech_encoder_chunk_size is not None:
            chunk = chunk_mask_bias(h.shape[1], self.config.speech_encoder_chunk_size,
                                    self.config.speech_encoder_left_chunk_num)
            mask_bias = chunk if mask_bias is None else mask_bias + chunk
        for i, layer in enumerate(self.encoder.layers):
            h = layer(params["encoder"]["layers"][str(i)], h, mask_bias, None, conv_mask)
        ffn = params["intermediate_ffn"]
        expanded = self.intermediate_ffn.output_dense(
            ffn["output_dense"], jax.nn.relu(
                self.intermediate_ffn.intermediate_dense(ffn["intermediate_dense"], h)))
        h = h + 0.5 * expanded
        if self.adapter is not None:
            for i, layer in enumerate(self.adapter.layers):
                h = layer(params["adapter"]["layers"][str(i)], h)
        return self.inner_layer_norm(params["inner_layer_norm"], h)


class SeamlessM4Tv2PreTrainedModel(PreTrainedModel):
    config_class = SeamlessM4Tv2Config
    base_model_prefix = "seamless_m4t_v2"
    _keys_to_ignore_on_load_unexpected = (
        r"\.embed_tokens\.weight$", r"\.num_batches_tracked$", r"^lm_head\.weight$",
        r"\.embed_positions\.weights$")


class SeamlessM4Tv2ForTextToText(SeamlessM4TForTextToText):
    config_class = SeamlessM4Tv2Config


class SeamlessM4Tv2ForSpeechToText(_SeamlessTextBase):
    config_class = SeamlessM4Tv2Config
    main_input_name = "input_features"
    encoder_input_name = "input_features"
    _is_speech = True
    _keys_to_ignore_on_load_unexpected = SeamlessM4Tv2PreTrainedModel._keys_to_ignore_on_load_unexpected

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.hidden_size,
                                embedding_init=normal_init(config.initializer_range), **kw)
        self.speech_encoder = SeamlessM4Tv2SpeechEncoder(config, **kw)
        self.text_decoder = SeamlessM4TDecoder(config, **kw)

    def encode(self, params, input_features, attention_mask=None) -> BaseModelOutput:
        hidden = self.speech_encoder(params["speech_encoder"], input_features,
                                     attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)


class SeamlessM4Tv2CodeHifiGan(SeamlessM4TCodeHifiGan):
    config_class = SeamlessM4Tv2Config
