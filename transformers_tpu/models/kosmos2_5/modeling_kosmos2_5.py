"""KOSMOS-2.5 (reference models/kosmos2_5/modeling_kosmos2_5.py): document
OCR/markdown generation — a Pix2Struct-style vision encoder over flattened
patches (row/col embeddings, RMS pre-norms, gated-gelu MLP, but *scaled*
attention unlike Pix2Struct, :477) feeds 2048 latent queries through a
cross-attention resampler into the KOSMOS-2 text decoder, which adds a
2-way document segment embedding to its sinusoidal positions (:906)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...cache_utils import init_static_cache
from ...core.module import Embedding, Linear, Module, normal_init
from ...generation import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.attention import eager_attention
from ...ops.masks import causal_mask_bool, to_additive
from ..kosmos2.modeling_kosmos2 import (
    Kosmos2ImageToTextProjection,
    Kosmos2TextBlock,
    Kosmos2TextTransformer,
    KosmosTextAttention,
)
from ..pix2struct.modeling_pix2struct import (
    Pix2StructVisionEmbeddings,
    Pix2StructVisionLayer,
    Pix2StructVisionMlp,
)
from ..speecht5.modeling_speecht5 import positions_from_input_ids
from ...core.module import RMSNorm
from .configuration_kosmos2_5 import Kosmos2_5Config


class Kosmos2_5VisionAttention(Module):
    """reference :477 — scaled MHA with explicit head_dim, projections named
    query/key/value/output (Pix2Struct's is unscaled; KOSMOS-2.5 scales)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.head_dim = config.head_dim
        self.num_heads = config.num_attention_heads
        inner = self.num_heads * self.head_dim
        self.query = Linear(config.hidden_size, inner, False, **kw)
        self.key = Linear(config.hidden_size, inner, False, **kw)
        self.value = Linear(config.hidden_size, inner, False, **kw)
        self.output = Linear(inner, config.hidden_size, False, **kw)

    def __call__(self, params, hidden, bias):
        b, s, _ = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, bias, scale=self.head_dim ** -0.5)
        return self.output(params["output"], out.reshape(b, s, -1))


class Kosmos2_5VisionLayer(Pix2StructVisionLayer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # swap in the scaled attention (same child name / param layout)
        self.attention = Kosmos2_5VisionAttention(config, dtype=dtype,
                                                  param_dtype=param_dtype)


class _VisionEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [Kosmos2_5VisionLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]


class Kosmos2_5VisionModel(Module):
    """reference :1040 — Pix2Struct vision body + final RMS layernorm."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Pix2StructVisionEmbeddings(config, **kw)
        self.encoder = _VisionEncoder(config, **kw)
        self.layernorm = RMSNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, flattened_patches, attention_mask=None):
        if attention_mask is None:
            attention_mask = (flattened_patches.sum(-1) != 0).astype(jnp.int32)
        hidden = self.embeddings(params["embeddings"],
                                 jnp.asarray(flattened_patches, self.dtype))
        bias = to_additive(attention_mask.astype(bool)[:, None, None, :], jnp.float32)
        for i, layer in enumerate(self.encoder.layer):
            hidden = layer(params["encoder"]["layer"][str(i)], hidden, bias)
        return self.layernorm(params["layernorm"], hidden)


class Kosmos2_5TextBlock(Kosmos2TextBlock):
    """KOSMOS-2 block but the self-attention has NO inner layernorm
    (reference Kosmos2_5TextAttention:747 vs kosmos2's inner_attn_ln)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.self_attn = KosmosTextAttention(
            config, config.embed_dim, config.attention_heads, False,
            dtype=dtype, param_dtype=param_dtype)


class Kosmos2_5TextTransformer(Kosmos2TextTransformer):
    """KOSMOS-2 text stack + 2-row segment embedding added to the positional
    embedding (reference :906-968: segment 1 = image region, 0 = text)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [Kosmos2_5TextBlock(config, **kw)
                       for _ in range(config.layers)]
        self.segment_emb = Embedding(2, config.embed_dim,
                                     embedding_init=normal_init(config.init_std),
                                     **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 image_embeds=None, image_embeds_position_mask=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        if image_embeds is not None and image_embeds_position_mask is not None:
            flat = image_embeds.reshape(-1, image_embeds.shape[-1]).astype(inputs_embeds.dtype)
            mask = image_embeds_position_mask.astype(bool)
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
            inputs_embeds = jnp.where(mask[..., None],
                                      gathered.reshape(inputs_embeds.shape),
                                      inputs_embeds)
        hidden = inputs_embeds * self.embed_scale
        b, s, _ = hidden.shape
        pos_ids = positions_from_input_ids(input_ids, self.config.pad_token_id,
                                           past_len=cache_position)
        positions = jnp.take(self.sin_table, pos_ids, axis=0).astype(hidden.dtype)
        if image_embeds_position_mask is not None:
            seg_ids = (image_embeds_position_mask != 0).astype(jnp.int32)
        else:
            seg_ids = jnp.zeros((b, s), jnp.int32)
        positions = positions + self.segment_emb(params["segment_emb"], seg_ids)
        hidden = hidden + positions

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)
        q_positions = jnp.broadcast_to(q_positions[None], (b, s))
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, kv_len), jnp.int32))
        mask_bias = to_additive(causal_mask_bool(q_positions, kv_valid), jnp.float32)

        cache = past_key_values
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, mask_bias,
                                  cache, i, cache_position)
        hidden = self.layer_norm(params["layer_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _TextModelWrapper(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.model = Kosmos2_5TextTransformer(config, dtype=dtype, param_dtype=param_dtype)


class Kosmos2_5ImageToTextProjection(Kosmos2ImageToTextProjection):
    """Same latent-query resampler; the 2.5 x_attn has no inner layernorm and
    the query count is config.latent_query_num=2048 (reference :1004)."""


class Kosmos2_5PreTrainedModel(PreTrainedModel):
    config_class = Kosmos2_5Config
    base_model_prefix = ""


class Kosmos2_5ForConditionalGeneration(Kosmos2_5PreTrainedModel, GenerationMixin):
    """reference :1405."""

    main_input_name = "input_ids"
    _prefill_input_names = ("flattened_patches", "image_embeds_position_mask")
    _keys_to_ignore_on_load_unexpected = (r"^text_model\.lm_head\.",)

    def __init__(self, config: Kosmos2_5Config, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = _TextModelWrapper(config.text_config, **kw)
        self.vision_model = Kosmos2_5VisionModel(config.vision_config, **kw)
        self.image_to_text_projection = Kosmos2_5ImageToTextProjection(config, **kw)

    def get_input_embedding_path(self):
        return "text_model.model.embed_tokens.weight"

    def get_image_features(self, params, flattened_patches):
        feats = self.vision_model(params["vision_model"], flattened_patches)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        return self.image_to_text_projection(params["image_to_text_projection"], feats)

    def compute_logits(self, params, hidden):
        return self.text_model.model.embed_tokens.attend(
            params["text_model"]["model"]["embed_tokens"], hidden)

    def init_cache(self, batch_size, max_len, dtype=None,
                   implementation: str = "static"):
        c = self.config.text_config
        return init_static_cache(
            num_layers=c.layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=c.attention_heads,
            head_dim=c.embed_dim // c.attention_heads, dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, flattened_patches=None,
                 width=None, height=None, image_embeds_position_mask=None,
                 attention_mask=None, image_embeds=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if image_embeds is None and flattened_patches is not None:
            image_embeds = self.get_image_features(params, flattened_patches)
        outputs = self.text_model.model(
            params["text_model"]["model"], input_ids, attention_mask,
            image_embeds, image_embeds_position_mask, past_key_values,
            cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)
