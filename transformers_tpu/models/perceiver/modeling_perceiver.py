"""Perceiver (IO) — latent-bottleneck general-purpose encoder, TPU-native
(reference src/transformers/models/perceiver/modeling_perceiver.py).

Learned latents cross-attend the (preprocessed) inputs once, then run
``num_blocks x num_self_attends_per_block`` latent self-attention (:418);
task decoders cross-attend the latents with task-specific queries (:1869).
Implemented heads: masked LM (text preprocessor + tied embedding decoder),
sequence classification, and learned-position image classification. The
optical-flow and multimodal-autoencoding pipelines are not yet ported."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_perceiver import PerceiverConfig


@dataclass
class PerceiverModelOutput(ModelOutput):
    logits: Optional[jnp.ndarray] = None
    last_hidden_state: Optional[jnp.ndarray] = None


@dataclass
class PerceiverClassifierOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


class PerceiverSelfAttention(Module):
    """QK/V-channel-factorized attention (reference :136)."""

    def __init__(self, config, is_cross_attention=False, qk_channels=None,
                 v_channels=None, num_heads=1, q_dim=None, kv_dim=None,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if qk_channels is None:
            qk_channels = q_dim
        if v_channels is None:
            v_channels = qk_channels
        self.num_heads = num_heads
        self.qk_channels = qk_channels
        self.v_channels = v_channels
        self.qk_per_head = qk_channels // num_heads
        self.v_per_head = v_channels // num_heads
        self.is_cross = is_cross_attention
        self.layernorm1 = LayerNorm(q_dim, **kw)
        if is_cross_attention:
            self.layernorm2 = LayerNorm(kv_dim, **kw)
        self.query = Linear(q_dim, qk_channels, **kw)
        self.key = Linear(kv_dim, qk_channels, **kw)
        self.value = Linear(kv_dim, v_channels, **kw)

    def __call__(self, params, hidden, inputs=None, inputs_mask=None):
        hidden = self.layernorm1(params["layernorm1"], hidden)
        if inputs is not None and self.is_cross:
            inputs = self.layernorm2(params["layernorm2"], inputs)
        src = inputs if inputs is not None else hidden
        b = hidden.shape[0]
        split = lambda x, per: jnp.swapaxes(
            x.reshape(b, -1, self.num_heads, per), 1, 2)
        q = split(self.query(params["query"], hidden), self.qk_per_head)
        k = split(self.key(params["key"], src), self.qk_per_head)
        v = split(self.value(params["value"], src), self.v_per_head)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(self.qk_per_head)
        if inputs is not None and inputs_mask is not None:
            scores = scores + (1.0 - inputs_mask[:, None, None, :]
                               .astype(jnp.float32)) * jnp.finfo(jnp.float32).min
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        return jnp.swapaxes(out, 1, 2).reshape(b, -1, self.v_channels)


class PerceiverAttention(Module):
    def __init__(self, config, is_cross_attention=False, qk_channels=None,
                 v_channels=None, num_heads=1, q_dim=None, kv_dim=None,
                 use_query_residual=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if is_cross_attention and qk_channels is None:
            qk_channels = (q_dim if config.cross_attention_shape_for_attention == "q"
                           else kv_dim)
        elif qk_channels is None:
            qk_channels = q_dim
        if v_channels is None:
            v_channels = qk_channels
        self.self = PerceiverSelfAttention(
            config, is_cross_attention=is_cross_attention, qk_channels=qk_channels,
            v_channels=v_channels, num_heads=num_heads, q_dim=q_dim, kv_dim=kv_dim, **kw)
        out_ch = q_dim if is_cross_attention else v_channels
        self.output = _SelfOutput(v_channels, out_ch, **kw)
        self.use_query_residual = use_query_residual

    def __call__(self, params, hidden, inputs=None, inputs_mask=None):
        h = self.self(params["self"], hidden, inputs, inputs_mask)
        h = self.output(params["output"], h)
        if self.use_query_residual:
            h = h + hidden
        return h


class _SelfOutput(Module):
    def __init__(self, in_ch, out_ch, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_ch, out_ch, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.dense(params["dense"], x)


class PerceiverMLP(Module):
    def __init__(self, config, input_size, widening_factor, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense1 = Linear(input_size, widening_factor * input_size, **kw)
        self.dense2 = Linear(widening_factor * input_size, input_size, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.dense2(params["dense2"], self.act(self.dense1(params["dense1"], x)))


class PerceiverLayer(Module):
    def __init__(self, config, is_cross_attention=False, qk_channels=None,
                 v_channels=None, num_heads=1, q_dim=None, kv_dim=None,
                 widening_factor=4, use_query_residual=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = PerceiverAttention(
            config, is_cross_attention=is_cross_attention, qk_channels=qk_channels,
            v_channels=v_channels, num_heads=num_heads, q_dim=q_dim, kv_dim=kv_dim,
            use_query_residual=use_query_residual, **kw)
        self.layernorm = LayerNorm(q_dim, **kw)
        self.mlp = PerceiverMLP(config, q_dim, widening_factor, **kw)

    def __call__(self, params, hidden, inputs=None, inputs_mask=None):
        attn = self.attention(params["attention"], hidden, inputs, inputs_mask)
        h = self.mlp(params["mlp"], self.layernorm(params["layernorm"], attn))
        return h + attn


class PerceiverEncoder(Module):
    def __init__(self, config, kv_dim=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.cross_attention = PerceiverLayer(
            config, is_cross_attention=True, qk_channels=config.qk_channels,
            v_channels=config.v_channels, num_heads=config.num_cross_attention_heads,
            q_dim=config.d_latents, kv_dim=kv_dim,
            widening_factor=config.cross_attention_widening_factor,
            use_query_residual=config.use_query_residual, **kw)
        self.self_attends = [PerceiverLayer(
            config, qk_channels=config.qk_channels, v_channels=config.v_channels,
            num_heads=config.num_self_attention_heads, q_dim=config.d_latents,
            kv_dim=config.d_latents,
            widening_factor=config.self_attention_widening_factor, **kw)
            for _ in range(config.num_self_attends_per_block)]

    def __call__(self, params, latents, inputs, inputs_mask=None):
        h = self.cross_attention(params["cross_attention"], latents, inputs, inputs_mask)
        for _ in range(self.config.num_blocks):
            for i, layer in enumerate(self.self_attends):
                h = layer(params["self_attends"][str(i)], h)
        return h


class PerceiverTrainablePositionEncoding(Module):
    def __init__(self, index_dims, num_channels=128, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        import numpy as np

        self.index_dim = int(np.prod(index_dims))
        self.num_channels = num_channels

    def init(self, rng):
        return {"position_embeddings": jax.random.normal(
            rng, (self.index_dim, self.num_channels), self.param_dtype)}

    def __call__(self, params, batch_size):
        pos = params["position_embeddings"].astype(self.dtype)
        return jnp.broadcast_to(pos[None], (batch_size,) + pos.shape)


class PerceiverTextPreprocessor(Module):
    """token + learned position embeddings (reference :2662)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.embeddings = Embedding(config.vocab_size, config.d_model, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.d_model, **kw)
        self.num_channels = config.d_model

    def __call__(self, params, inputs):
        embeds = self.embeddings(params["embeddings"], inputs)
        pos_ids = jnp.arange(inputs.shape[1])
        return embeds + self.position_embeddings(params["position_embeddings"],
                                                 pos_ids)[None]


class PerceiverImagePreprocessor(Module):
    """conv1x1 + trainable positions, concat mode (reference :2825; only the
    configuration used by ForImageClassificationLearned is ported)."""

    def __init__(self, config, out_channels=256, project_pos_dim=256,
                 pos_num_channels=256, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convnet_1x1 = Conv(3, out_channels, 1, ndim=2, **kw)
        self.position_embeddings = PerceiverTrainablePositionEncoding(
            config.image_size**2, pos_num_channels, **kw)
        self.positions_projection = Linear(pos_num_channels, project_pos_dim, **kw)
        self.num_channels = out_channels + project_pos_dim

    def __call__(self, params, inputs):
        h = self.convnet_1x1(params["convnet_1x1"], inputs)
        b, c = h.shape[:2]
        h = jnp.swapaxes(h.reshape(b, c, -1), 1, 2)  # [B, HW, C]
        pos = self.position_embeddings(params["position_embeddings"], b)
        pos = self.positions_projection(params["positions_projection"], pos)
        return jnp.concatenate([h, pos], axis=-1)


class PerceiverBasicDecoder(Module):
    """Cross-attention decoder with trainable query positions (reference :1869)."""

    def __init__(self, config, output_num_channels, output_index_dims=None,
                 num_channels=128, qk_channels=None, v_channels=None, num_heads=1,
                 widening_factor=1, use_query_residual=False, final_project=True,
                 pos_num_channels=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.output_position_encodings = PerceiverTrainablePositionEncoding(
            output_index_dims, pos_num_channels or num_channels, **kw)
        self.decoding_cross_attention = PerceiverLayer(
            config, is_cross_attention=True, qk_channels=qk_channels,
            v_channels=v_channels, num_heads=num_heads, q_dim=num_channels,
            kv_dim=config.d_latents, widening_factor=widening_factor,
            use_query_residual=use_query_residual, **kw)
        self.final_project = final_project
        if final_project:
            self.final_layer = Linear(num_channels, output_num_channels, **kw)

    def decoder_query(self, params, batch_size):
        return self.output_position_encodings(params["output_position_encodings"],
                                              batch_size)

    def __call__(self, params, query, z):
        h = self.decoding_cross_attention(params["decoding_cross_attention"], query, z)
        if self.final_project:
            h = self.final_layer(params["final_layer"], h)
        return h


class PerceiverClassificationDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.decoder = PerceiverBasicDecoder(
            config, output_num_channels=config.num_labels, output_index_dims=1,
            num_channels=config.d_latents, use_query_residual=True,
            dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, z):
        query = self.decoder.decoder_query(params["decoder"], z.shape[0])
        return self.decoder(params["decoder"], query, z)[:, 0, :]


class PerceiverEmbeddingDecoder(Module):
    """Tied-embedding output head with a standalone bias (reference :2699)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        return {"bias": jnp.zeros((self.vocab_size,), self.param_dtype)}

    def __call__(self, params, hidden, embedding_weight):
        logits = hidden @ embedding_weight.astype(hidden.dtype).T
        return logits + params["bias"].astype(logits.dtype)


class PerceiverEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config

    def init(self, rng):
        return {"latents": jax.random.normal(
            rng, (self.config.num_latents, self.config.d_latents), self.param_dtype)}

    def __call__(self, params, batch_size):
        lat = params["latents"].astype(self.dtype)
        return jnp.broadcast_to(lat[None], (batch_size,) + lat.shape)


class PerceiverModelCore(Module):
    def __init__(self, config, input_preprocessor=None, decoder=None,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        if input_preprocessor is not None:
            self.input_preprocessor = input_preprocessor
        self.embeddings = PerceiverEmbeddings(config, **kw)
        kv_dim = (input_preprocessor.num_channels if input_preprocessor is not None
                  else config.d_model)
        self.encoder = PerceiverEncoder(config, kv_dim=kv_dim, **kw)
        if decoder is not None:
            self.decoder = decoder

    def encode(self, params, inputs, attention_mask=None):
        if getattr(self, "input_preprocessor", None) is not None:
            inputs = self.input_preprocessor(params["input_preprocessor"], inputs)
        b = inputs.shape[0]
        latents = self.embeddings(params["embeddings"], b)
        return self.encoder(params["encoder"], latents, inputs, attention_mask)


class PerceiverPreTrainedModel(PreTrainedModel):
    config_class = PerceiverConfig
    base_model_prefix = "perceiver"


class PerceiverModel(PerceiverPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = PerceiverModelCore(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        for name, child in core.children.items():
            setattr(self, name, child)
        object.__setattr__(self, "_core", core)

    def __call__(self, params, inputs=None, attention_mask=None, **kwargs):
        h = self._core.encode(params, inputs, attention_mask)
        return PerceiverModelOutput(last_hidden_state=h)


class PerceiverForMaskedLM(PerceiverPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pre = PerceiverTextPreprocessor(config, **kw)
        # the MLM head attaches a BARE BasicDecoder (reference :821), so its
        # checkpoint keys are perceiver.decoder.* with no extra nesting
        dec = PerceiverBasicDecoder(
            config, output_num_channels=config.d_latents,
            output_index_dims=config.max_position_embeddings,
            num_channels=config.d_model, qk_channels=8 * 32,
            v_channels=config.d_model, num_heads=8, use_query_residual=False,
            final_project=False, **kw)
        self.perceiver = PerceiverModelCore(config, input_preprocessor=pre,
                                            decoder=dec, **kw)
        self.embedding_decoder = PerceiverEmbeddingDecoder(config, **kw)

    def __call__(self, params, inputs=None, input_ids=None, attention_mask=None,
                 labels=None, **kwargs):
        inputs = inputs if inputs is not None else input_ids
        core = params["perceiver"]
        z = self.perceiver.encode(core, inputs, attention_mask)
        dec = self.perceiver.decoder
        query = dec.decoder_query(core["decoder"], z.shape[0])
        h = dec(core["decoder"], query, z)
        logits = self.embedding_decoder(
            params["embedding_decoder"], h,
            core["input_preprocessor"]["embeddings"]["weight"])
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits[:, : labels.shape[1]], labels,
                                      self.config.vocab_size)
        return PerceiverClassifierOutput(loss=loss, logits=logits)


class _ClsDecoderWrap(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.decoder = PerceiverBasicDecoder(
            config, output_num_channels=config.num_labels, output_index_dims=1,
            num_channels=config.d_latents, use_query_residual=True,
            dtype=dtype, param_dtype=param_dtype)


class _PerceiverClassifierBase(PerceiverPreTrainedModel):
    def _build_preprocessor(self, config, kw):
        raise NotImplementedError

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pre = self._build_preprocessor(config, kw)
        dec = _ClsDecoderWrap(config, **kw)
        self.perceiver = PerceiverModelCore(config, input_preprocessor=pre,
                                            decoder=dec, **kw)

    def __call__(self, params, inputs=None, input_ids=None, pixel_values=None,
                 attention_mask=None, labels=None, **kwargs):
        if inputs is None:
            inputs = input_ids if input_ids is not None else pixel_values
        core = params["perceiver"]
        z = self.perceiver.encode(core, inputs, attention_mask)
        dec = self.perceiver.decoder
        query = dec.decoder.decoder_query(core["decoder"]["decoder"], z.shape[0])
        logits = dec.decoder(core["decoder"]["decoder"], query, z)[:, 0, :]
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return PerceiverClassifierOutput(loss=loss, logits=logits)


class PerceiverForSequenceClassification(_PerceiverClassifierBase):
    def _build_preprocessor(self, config, kw):
        return PerceiverTextPreprocessor(config, **kw)


class PerceiverForImageClassificationLearned(_PerceiverClassifierBase):
    def _build_preprocessor(self, config, kw):
        return PerceiverImagePreprocessor(config, out_channels=256,
                                          project_pos_dim=256,
                                          pos_num_channels=256, **kw)
