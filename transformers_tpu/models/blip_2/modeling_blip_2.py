"""BLIP-2, TPU-native (reference src/transformers/models/blip_2/modeling_blip_2.py).

Three-stage composition: a pre-LN ViT (fused qkv, reference Blip2Attention)
→ a Q-Former whose learned ``query_tokens`` self-attend and cross-attend
into the frozen vision features every ``cross_attention_frequency`` layers
(query positions use the dedicated ``intermediate_query``/``output_query``
FF, reference Blip2QFormerLayer) → ``language_projection`` into the language
model's embedding space, scattered at image-token placeholder positions
(``get_placeholder_mask`` + masked_scatter, same contract as LLaVA).
The language model is the composed decoder (OPT family) with its own head.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPooling, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import BertIntermediate, BertOutput, BertSelfOutput
from .configuration_blip_2 import Blip2Config, Blip2QFormerConfig, Blip2VisionConfig


# --------------------------------------------------------------------- vision
class Blip2VisionEmbeddings(Module):
    def __init__(self, config: Blip2VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embedding = Conv(3, config.hidden_size, config.patch_size,
                                    stride=config.patch_size, use_bias=True, ndim=2,
                                    dtype=dtype, param_dtype=param_dtype)
        self.num_positions = (config.image_size // config.patch_size) ** 2 + 1

    def init(self, rng):
        params = super().init(rng)
        k1, k2 = jax.random.split(rng)
        init = normal_init(self.config.initializer_range)
        params["class_embedding"] = init(k1, (1, 1, self.config.hidden_size),
                                         self.param_dtype)
        params["position_embedding"] = init(
            k2, (1, self.num_positions, self.config.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        b = pixel_values.shape[0]
        patches = self.patch_embedding(params["patch_embedding"],
                                       pixel_values.astype(self.dtype))  # [B,D,H,W]
        patches = patches.reshape(b, patches.shape[1], -1).transpose(0, 2, 1)
        cls = jnp.broadcast_to(params["class_embedding"].astype(self.dtype),
                               (b, 1, patches.shape[-1]))
        emb = jnp.concatenate([cls, patches], axis=1)
        pos = params["position_embedding"].astype(self.dtype)[:, : emb.shape[1]]
        return emb + pos


class Blip2Attention(Module):
    """Fused qkv projection (reference Blip2Attention)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.qkv = Linear(config.hidden_size, 3 * config.hidden_size,
                          config.qkv_bias, **kw)
        self.projection = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden):
        b, s, e = hidden.shape
        qkv = self.qkv(params["qkv"], hidden).reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, is_causal=False,
                      kv_valid=jnp.ones((b, s), jnp.int32))
        return self.projection(params["projection"], out.reshape(b, s, e))


class Blip2MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **lkw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **lkw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class Blip2EncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = Blip2Attention(config, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = Blip2MLP(config, **kw)

    def __call__(self, params, hidden):
        residual = hidden
        h = self.layer_norm1(params["layer_norm1"], hidden)
        hidden = residual + self.self_attn(params["self_attn"], h)
        residual = hidden
        h = self.layer_norm2(params["layer_norm2"], hidden)
        return residual + self.mlp(params["mlp"], h)


class Blip2VisionModel(Module):
    def __init__(self, config: Blip2VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Blip2VisionEmbeddings(config, **kw)
        self.encoder = _Blip2VisionEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states)
        hidden = self.post_layernorm(params["post_layernorm"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=None,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _Blip2VisionEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [Blip2EncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layers"][str(i)], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


# -------------------------------------------------------------------- qformer
class Blip2QFormerMultiHeadAttention(Module):
    """BERT-style q/k/v attention, optionally cross-attending (keys from
    ``encoder_hidden_states`` of width encoder_hidden_size)."""

    def __init__(self, config, is_cross, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kv_width = config.encoder_hidden_size if is_cross else config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(kv_width, config.hidden_size, True, **kw)
        self.value = Linear(kv_width, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, kv_hidden, kv_valid=None):
        b, s, _ = hidden.shape
        t = kv_hidden.shape[1]
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], kv_hidden).reshape(b, t, self.num_heads, self.head_dim)
        v = self.value(params["value"], kv_hidden).reshape(b, t, self.num_heads, self.head_dim)
        scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (self.head_dim**-0.5)
        if kv_valid is not None:
            scores = jnp.where(kv_valid.astype(bool)[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
        return out.reshape(b, s, self.num_heads * self.head_dim).astype(hidden.dtype)


class _QFormerAttentionBlock(Module):
    def __init__(self, config, is_cross, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.attention = Blip2QFormerMultiHeadAttention(config, is_cross, dtype=dtype,
                                                        param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, kv_hidden, kv_valid=None):
        out = self.attention(params["attention"], hidden, kv_hidden, kv_valid)
        return self.output(params["output"], out, hidden)


class Blip2QFormerLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _QFormerAttentionBlock(config, False, **kw)
        self.has_cross = layer_idx % config.cross_attention_frequency == 0
        if self.has_cross:
            self.crossattention = _QFormerAttentionBlock(config, True, **kw)
        self.intermediate_query = BertIntermediate(config, **kw)
        self.output_query = BertOutput(config, **kw)

    def __call__(self, params, hidden, encoder_hidden, self_valid=None):
        h = self.attention(params["attention"], hidden, hidden, self_valid)
        if self.has_cross:
            h = self.crossattention(params["crossattention"], h, encoder_hidden)
        inner = self.intermediate_query(params["intermediate_query"], h)
        return self.output_query(params["output_query"], inner, h)


class Blip2QFormerModel(Module):
    """Query-only Q-Former (reference Blip2QFormerModel): LayerNorm on the
    expanded query tokens, then the layer stack."""

    def __init__(self, config: Blip2QFormerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.encoder = _QFormerEncoder(config, **kw)

    def __call__(self, params, query_embeds, encoder_hidden_states):
        hidden = self.layernorm(params["layernorm"], query_embeds)
        return self.encoder(params["encoder"], hidden, encoder_hidden_states)


class _QFormerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [Blip2QFormerLayer(config, i, dtype=dtype, param_dtype=param_dtype)
                      for i in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, encoder_hidden):
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden, encoder_hidden)
        return hidden


# ----------------------------------------------------------------- full model
class Blip2PreTrainedModel(PreTrainedModel):
    config_class = Blip2Config
    base_model_prefix = ""


class Blip2ForConditionalGeneration(Blip2PreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)

    def __init__(self, config: Blip2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = Blip2VisionModel(config.vision_config, **kw)
        self.qformer = Blip2QFormerModel(config.qformer_config, **kw)
        self.language_projection = Linear(config.qformer_config.hidden_size,
                                          config.text_config.hidden_size, True, **kw)
        if not config.use_decoder_only_language_model:
            raise NotImplementedError(
                "BLIP-2 with encoder-decoder language models lands with the "
                "T5-composition round; OPT-family checkpoints are supported.")
        from ..auto.modeling_auto import MODEL_FOR_CAUSAL_LM_MAPPING_NAMES
        import importlib

        module_name, cls_name = MODEL_FOR_CAUSAL_LM_MAPPING_NAMES[
            config.text_config.model_type]
        lm_cls = getattr(importlib.import_module(
            f"transformers_tpu.models.{module_name}"), cls_name)
        self.language_model = lm_cls(config.text_config, **kw)
        self.num_query_tokens = config.num_query_tokens

    def init(self, rng):
        params = super().init(rng)
        params["query_tokens"] = normal_init(0.02)(
            rng, (1, self.num_query_tokens, self.config.qformer_config.hidden_size),
            self.param_dtype)
        return params

    def get_input_embedding_path(self):
        return ("language_model."
                + self.language_model.get_input_embedding_path())

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def get_image_features(self, params, pixel_values):
        vision_out = self.vision_model(params["vision_model"], pixel_values)
        queries = jnp.broadcast_to(
            params["query_tokens"].astype(self.dtype),
            (pixel_values.shape[0], self.num_query_tokens,
             self.config.qformer_config.hidden_size))
        q_out = self.qformer(params["qformer"], queries, vision_out.last_hidden_state)
        return self.language_projection(params["language_projection"], q_out)

    def _embed(self, params, input_ids, pixel_values):
        lm = self.language_model
        embed_path = lm.get_input_embedding_path().split(".")[:-1]
        mod = lm
        sub = params["language_model"]
        for name in embed_path:
            mod = getattr(mod, name)
            sub = sub[name]
        safe_ids = jnp.where(input_ids == self.config.image_token_id, 0, input_ids)
        embeds = mod(sub, safe_ids)
        if pixel_values is None:
            return embeds
        feats = self.get_image_features(params, pixel_values)
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = input_ids == self.config.image_token_id
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self._embed(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, labels, logits_to_keep,
            output_hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return self.language_model.init_cache(batch_size, max_len,
                                              dtype or self.dtype, implementation)
