"""KOSMOS-2, TPU-native (reference src/transformers/models/kosmos2/modeling_kosmos2.py).

Grounded VLM: CLIP ViT vision tower → post-layernorm + L2-normalize over ALL
patch tokens → latent-query cross-attention resampler
(Kosmos2ImageToTextProjection) → 64 image embeddings scattered into the
pre-LN text decoder at <image> placeholder positions (before the
sqrt(embed_dim) scale).  The text decoder is fairseq-style: padding-aware
sinusoid positions (offset 2), inner_attn_ln between attention and out_proj,
ffn_layernorm inside the FFN, tied lm_head.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import causal_mask_bool, to_additive
from ..clip.modeling_clip import CLIPVisionTransformer
from ..speecht5.modeling_speecht5 import (positions_from_input_ids,
                                          sinusoidal_table)
from .configuration_kosmos2 import Kosmos2Config, Kosmos2TextConfig


class KosmosTextAttention(Module):
    """Bart-style attention with an optional LayerNorm between the attention
    output and out_proj (reference KosmosTextAttention.inner_attn_ln)."""

    def __init__(self, config, embed_dim, num_heads, add_inner_attn_layernorm,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.q_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.k_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.v_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.out_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.has_inner_ln = add_inner_attn_layernorm
        if add_inner_attn_layernorm:
            self.inner_attn_ln = LayerNorm(embed_dim, config.layer_norm_eps,
                                           dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, mask_bias=None, kv_hidden=None,
                 cache: Optional[StaticKVCache] = None, layer_idx=0, cache_position=0):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        src = kv_hidden if kv_hidden is not None else hidden
        k = self.k_proj(params["k_proj"], src).reshape(b, -1, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], src).reshape(b, -1, self.num_heads, self.head_dim)
        if cache is not None:
            cache = cache.update(layer_idx, k, v, cache_position)
            k, v = cache.layer(layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.scale
        scores = scores.astype(jnp.float32)
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        if self.has_inner_ln:
            out = self.inner_attn_ln(params["inner_attn_ln"], out)
        return self.out_proj(params["out_proj"], out), cache


class Kosmos2TextFFN(Module):
    def __init__(self, config: Kosmos2TextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.fc1 = Linear(config.embed_dim, config.ffn_dim, True, **kw)
        self.fc2 = Linear(config.ffn_dim, config.embed_dim, True, **kw)
        self.ffn_layernorm = LayerNorm(config.ffn_dim, config.layer_norm_eps,
                                       dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        h = self.act(self.fc1(params["fc1"], x))
        h = self.ffn_layernorm(params["ffn_layernorm"], h)
        return self.fc2(params["fc2"], h)


class Kosmos2TextBlock(Module):
    def __init__(self, config: Kosmos2TextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.embed_dim
        self.self_attn = KosmosTextAttention(config, d, config.attention_heads,
                                             True, **kw)
        self.self_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.ffn = Kosmos2TextFFN(config, **kw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, mask_bias, cache, layer_idx, cache_position):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, mask_bias, None, cache,
                                  layer_idx, cache_position)
        hidden = hidden + h
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        return hidden + self.ffn(params["ffn"], h), cache


class Kosmos2TextTransformer(Module):
    def __init__(self, config: Kosmos2TextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_scale = math.sqrt(config.embed_dim) if config.scale_embedding else 1.0
        self.embed_tokens = Embedding(config.vocab_size, config.embed_dim,
                                      embedding_init=normal_init(config.init_std), **kw)
        self.layers = [Kosmos2TextBlock(config, **kw) for _ in range(config.layers)]
        self.layer_norm = LayerNorm(config.embed_dim, config.layer_norm_eps, **kw)
        self.sin_table = sinusoidal_table(
            config.max_position_embeddings + config.pad_token_id + 1 + 2,
            config.embed_dim, config.pad_token_id)

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
        hidden = hidden + jnp.take(self.sin_table, pos_ids, axis=0).astype(hidden.dtype)

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
        self.model = Kosmos2TextTransformer(config, dtype=dtype, param_dtype=param_dtype)


class _VisionModelWrapper(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.model = CLIPVisionTransformer(config, dtype=dtype, param_dtype=param_dtype)


class Kosmos2ImageToTextProjection(Module):
    """Latent-query resampler (reference Kosmos2ImageToTextProjection)."""

    def __init__(self, config: Kosmos2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.latent_query_num = config.latent_query_num
        self.embed_dim = config.text_config.embed_dim
        self.dense = Linear(config.vision_config.hidden_size,
                            config.text_config.embed_dim, True,
                            kernel_init=normal_init(0.02), **kw)
        self.x_attn = KosmosTextAttention(config.text_config,
                                          config.text_config.embed_dim,
                                          config.text_config.attention_heads,
                                          False, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["latent_query"] = (jax.random.normal(
            rng, (self.latent_query_num, self.embed_dim)) * 1.0).astype(self.param_dtype)
        return params

    def __call__(self, params, features):
        hidden = self.dense(params["dense"], features)
        lq = jnp.broadcast_to(params["latent_query"].astype(hidden.dtype)[None],
                              (hidden.shape[0], self.latent_query_num, self.embed_dim))
        kv = jnp.concatenate([hidden, lq], axis=1)
        out, _ = self.x_attn(params["x_attn"], lq, None, kv_hidden=kv)
        return out


class Kosmos2PreTrainedModel(PreTrainedModel):
    config_class = Kosmos2Config
    base_model_prefix = ""


class Kosmos2ForConditionalGeneration(Kosmos2PreTrainedModel, GenerationMixin):
    """reference Kosmos2ForConditionalGeneration."""

    _prefill_input_names = ("pixel_values", "image_embeds_position_mask")

    def __init__(self, config: Kosmos2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = _VisionModelWrapper(config.vision_config, **kw)
        self.text_model = _TextModelWrapper(config.text_config, **kw)
        self.image_to_text_projection = Kosmos2ImageToTextProjection(config, **kw)
        if not config.text_config.tie_word_embeddings:
            self.lm_head = Linear(config.text_config.embed_dim,
                                  config.text_config.vocab_size, False,
                                  kernel_init=normal_init(config.text_config.init_std),
                                  **kw)

    def get_input_embedding_path(self):
        return "text_model.model.embed_tokens.weight"

    @property
    def _keys_to_ignore_on_load_unexpected(self):
        # the reference nests lm_head under text_model; tied anyway
        return (r"^text_model\.lm_head\.",)

    def get_image_features(self, params, pixel_values):
        out = self.vision_model.model(params["vision_model"]["model"], pixel_values)
        feats = self.vision_model.model.post_layernorm(
            params["vision_model"]["model"]["post_layernorm"], out.last_hidden_state)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        return self.image_to_text_projection(params["image_to_text_projection"], feats)

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            return self.text_model.model.embed_tokens.attend(
                params["text_model"]["model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def init_cache(self, batch_size, max_len, dtype=None,
                   implementation: str = "static"):
        c = self.config.text_config
        return init_static_cache(
            num_layers=c.layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=c.attention_heads,
            head_dim=c.embed_dim // c.attention_heads, dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_embeds_position_mask=None, attention_mask=None,
                 image_embeds=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        if image_embeds is None and pixel_values is not None:
            image_embeds = self.get_image_features(params, pixel_values)
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
