"""Idefics3, TPU-native (reference src/transformers/models/idefics3/modeling_idefics3.py).

SigLIP-shaped NaViT vision encoder with BUCKETIZED fractional position ids
(:134-165 — variable-resolution images reuse the square pre-training grid),
pixel-shuffle connector (:390), image embeds scattered into the llama text
sequence at <image> tokens.

TPU framing: the per-image patch counts are traced values; position ids are
computed vectorized for rectangular (top-left aligned) patch masks — the
layout the processor produces.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...cache_utils import cache_from_config
from ...core.loading import WeightRule
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutput, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..clip.modeling_clip import CLIPEncoder
from ..llava.modeling_llava import _language_model_cls
from .configuration_idefics3 import Idefics3Config, Idefics3VisionConfig


class Idefics3VisionEmbeddings(Module):
    """Conv patch embed + bucketized fractional position ids (reference :104)."""

    def __init__(self, config: Idefics3VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_size = config.patch_size
        self.npps = config.image_size // config.patch_size  # patches per side
        self.position_embedding = Embedding(
            self.npps ** 2, config.hidden_size, dtype=dtype, param_dtype=param_dtype,
            embedding_init=normal_init(config.initializer_range))

    def init(self, rng):
        import jax

        k1, _ = jax.random.split(rng)
        c = self.config
        params = super().init(rng)
        params["patch_embedding"] = {
            "weight": normal_init(c.initializer_range)(
                k1, (c.hidden_size, c.num_channels, c.patch_size, c.patch_size),
                self.param_dtype),
            "bias": jnp.zeros((c.hidden_size,), self.param_dtype),
        }
        return params

    def __call__(self, params, pixel_values, patch_attention_mask=None):
        b, ch, hh, ww = pixel_values.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = pixel_values.reshape(b, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, ch * p * p)
        w = params["patch_embedding"]["weight"].astype(self.dtype)
        patches = jnp.dot(x.astype(self.dtype), w.reshape(w.shape[0], -1).T)
        patches = patches + params["patch_embedding"]["bias"].astype(self.dtype)

        if patch_attention_mask is None:
            m = jnp.ones((b, gh, gw), jnp.int32)
        else:
            m = patch_attention_mask.astype(jnp.int32)  # [B, gh, gw]
        # bucketized fractional coords (reference :140-163 incl. the 1-1e-6
        # shrink, whose floor() consequences we reproduce exactly)
        nbh = jnp.maximum(m[:, :, 0].sum(-1), 1)[:, None, None]  # [B,1,1]
        nbw = jnp.maximum(m[:, 0, :].sum(-1), 1)[:, None, None]
        r = jnp.arange(gh, dtype=jnp.float32)[None, :, None]
        c = jnp.arange(gw, dtype=jnp.float32)[None, None, :]
        bh = jnp.floor(r / nbh * (1 - 1e-6) * self.npps).astype(jnp.int32)
        bw = jnp.floor(c / nbw * (1 - 1e-6) * self.npps).astype(jnp.int32)
        pos_ids = jnp.where(m > 0, bh * self.npps + bw, 0).reshape(b, gh * gw)
        return patches + self.position_embedding(params["position_embedding"], pos_ids)


class Idefics3VisionTransformer(Module):
    def __init__(self, config: Idefics3VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Idefics3VisionEmbeddings(config, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, patch_attention_mask=None):
        hidden = self.embeddings(params["embeddings"], pixel_values, patch_attention_mask)
        attn_args = {"is_causal": False}
        if patch_attention_mask is not None:
            b = pixel_values.shape[0]
            attn_args["kv_valid"] = patch_attention_mask.reshape(b, -1).astype(jnp.int32)
        hidden, _ = self.encoder(params["encoder"], hidden, attn_args, False)
        hidden = self.post_layernorm(params["post_layernorm"], hidden)
        return BaseModelOutput(last_hidden_state=hidden)


class Idefics3Connector(Module):
    """Pixel shuffle (space-to-depth, reference :390) + linear projection."""

    def __init__(self, config: Idefics3Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.scale_factor = config.scale_factor
        self.modality_projection = _SimpleMLP(config, dtype=dtype, param_dtype=param_dtype)

    @staticmethod
    def pixel_shuffle(x, scale_factor):
        b, seq, e = x.shape
        side = int(seq ** 0.5)
        x = x.reshape(b, side, side // scale_factor, e * scale_factor)
        x = jnp.swapaxes(x, 1, 2)
        x = x.reshape(b, side // scale_factor, side // scale_factor,
                      e * scale_factor ** 2)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(b, seq // scale_factor ** 2, e * scale_factor ** 2)

    def __call__(self, params, image_hidden_states):
        h = self.pixel_shuffle(image_hidden_states, self.scale_factor)
        return self.modality_projection(params["modality_projection"], h)


class _SimpleMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.proj = Linear(config.vision_config.hidden_size * config.scale_factor ** 2,
                           config.text_config.hidden_size, False,
                           dtype=dtype, param_dtype=param_dtype,
                           kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.proj(params["proj"], x)


class Idefics3Model(Module):
    def __init__(self, config: Idefics3Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_model = Idefics3VisionTransformer(config.vision_config, **kw)
        self.connector = Idefics3Connector(config, **kw)
        lm = _language_model_cls(config.text_config.model_type)(config.text_config, **kw)
        self.text_model = lm.model

    def get_image_features(self, params, pixel_values, pixel_attention_mask=None):
        """pixel_values [B, N, C, H, W] -> [B*N, S', text_hidden] (reference
        get_image_features; the all-zero padded-image filtering is the
        caller's concern under static shapes — pass only real images)."""
        b, n = pixel_values.shape[:2]
        pv = pixel_values.reshape((b * n,) + pixel_values.shape[2:])
        patch_mask = None
        if pixel_attention_mask is not None:
            pm = pixel_attention_mask.reshape((b * n,) + pixel_attention_mask.shape[2:])
            p = self.config.vision_config.patch_size
            gh, gw = pm.shape[1] // p, pm.shape[2] // p
            pm = pm[:, : gh * p, : gw * p].reshape(b * n, gh, p, gw, p)
            patch_mask = pm.sum(axis=(2, 4)) > 0
        out = self.vision_model(params["vision_model"], pv, patch_mask)
        return self.connector(params["connector"], out.last_hidden_state)

    def embed_with_images(self, params, input_ids, pixel_values, pixel_attention_mask=None):
        embeds = self.text_model.embed_tokens(
            params["text_model"]["embed_tokens"],
            jnp.where(input_ids == self.config.image_token_id, 0, input_ids))
        if pixel_values is None:
            return embeds
        feats = self.get_image_features(params, pixel_values, pixel_attention_mask)
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = input_ids == self.config.image_token_id
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 pixel_attention_mask=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values,
                                                   pixel_attention_mask)
        return self.text_model(
            params["text_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class Idefics3PreTrainedModel(PreTrainedModel):
    config_class = Idefics3Config
    base_model_prefix = "model"


class Idefics3ForConditionalGeneration(Idefics3PreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values", "pixel_attention_mask")
    _weight_rules = (
        WeightRule(pattern=r"^model\.text_model\.", rename="model.text_model."),
    )

    model_cls = Idefics3Model

    def __init__(self, config: Idefics3Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        text_config = config.text_config
        if not config.tie_word_embeddings:
            self.lm_head = Linear(text_config.hidden_size, text_config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.text_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            return self.model.text_model.embed_tokens.attend(
                params["model"]["text_model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 pixel_attention_mask=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, pixel_values,
                             pixel_attention_mask, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds,
                             output_hidden_states)
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

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype, implementation=implementation)
