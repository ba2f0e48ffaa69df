"""LLaVA-NeXT (1.6), TPU-native (reference
src/transformers/models/llava_next/modeling_llava_next.py).

AnyRes LLaVA: each image is a base thumbnail + a grid of high-res tiles.
Tile features are re-assembled into the 2D grid, unpadded back to the
original aspect ratio, an image_newline column is appended per row, and the
result is flattened and scattered into the text sequence.  Grid geometry is
a pure function of `image_sizes` + `image_grid_pinpoints` (host-side
integers), so the packing is static-shape per call; the heavy compute
(vision tower, projector, decoder) is the same jitted path as LLaVA.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..llava.modeling_llava import (LlavaForConditionalGeneration,
                                    LlavaMultiModalProjector, LlavaModel,
                                    _language_model_cls, _vision_tower_cls)
from .configuration_llava_next import LlavaNextConfig


def select_best_resolution(original_size, possible_resolutions):
    """(reference image_processing_utils.select_best_resolution)."""
    oh, ow = original_size
    best_fit, max_eff, min_wasted = None, 0, float("inf")
    for height, width in possible_resolutions:
        scale = min(width / ow, height / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        wasted = width * height - eff
        if eff > max_eff or (eff == max_eff and wasted < min_wasted):
            max_eff, min_wasted, best_fit = eff, wasted, (height, width)
    return best_fit


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size):
    height, width = select_best_resolution(tuple(image_size), grid_pinpoints)
    return height // patch_size, width // patch_size


def image_size_to_num_patches(image_size, grid_pinpoints, patch_size):
    height, width = select_best_resolution(tuple(image_size), grid_pinpoints)
    return math.ceil(height / patch_size) * math.ceil(width / patch_size) + 1


def unpad_image(tensor, original_size):
    """tensor [C, H, W] → strip the resize padding (reference unpad_image)."""
    oh, ow = original_size
    ch, cw = tensor.shape[1:]
    if ow / oh > cw / ch:
        new_h = int(round(oh * (cw / ow), 7))
        pad = (ch - new_h) // 2
        return tensor[:, pad: ch - pad, :]
    new_w = int(round(ow * (ch / oh), 7))
    pad = (cw - new_w) // 2
    return tensor[:, :, pad: cw - pad]


class LlavaNextModel(Module):
    """reference LlavaNextModel (vision_tower + projector + image_newline +
    language_model)."""

    def __init__(self, config: LlavaNextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_tower = _vision_tower_cls(config.vision_config.model_type)(
            config.vision_config, **kw)
        self.multi_modal_projector = LlavaMultiModalProjector(config, **kw)
        self.language_model = _language_model_cls(
            config.text_config.model_type)(config.text_config, **kw).model

    def init(self, rng):
        params = super().init(rng)
        import jax

        std = 1 / math.sqrt(self.config.text_config.hidden_size)
        params["image_newline"] = (jax.random.normal(
            rng, (self.config.text_config.hidden_size,)) * std).astype(self.param_dtype)
        return params

    def pack_image_features(self, params, image_features, image_sizes):
        """Grid reassembly + unpad + newline per image (reference
        pack_image_features); image_sizes are host ints."""
        cfg = self.config
        newline = params["image_newline"].astype(self.dtype)
        packed = []
        for idx, feats in enumerate(image_features):
            if feats.shape[0] > 1:
                base = feats[0]
                tiles = feats[1:]
                hw = cfg.vision_config.image_size // cfg.vision_config.patch_size
                nph, npw = get_anyres_image_grid_shape(
                    image_sizes[idx], cfg.image_grid_pinpoints,
                    cfg.vision_config.image_size)
                f = tiles.reshape(nph, npw, hw, hw, -1)
                f = f.transpose(4, 0, 2, 1, 3)
                f = f.reshape(f.shape[0], nph * hw, npw * hw)
                f = unpad_image(f, tuple(image_sizes[idx]))
                nl = jnp.broadcast_to(newline[:, None, None],
                                      (f.shape[0], f.shape[1], 1)).astype(f.dtype)
                f = jnp.concatenate([f, nl], axis=-1)
                f = f.reshape(f.shape[0], -1).T
                packed.append(jnp.concatenate([base, f], axis=0))
            else:
                packed.append(jnp.concatenate([feats[0], newline[None]], axis=0))
        return packed

    def get_image_features(self, params, pixel_values, image_sizes):
        cfg = self.config
        image_sizes = np.asarray(image_sizes).tolist()
        num_patches = [image_size_to_num_patches(s, cfg.image_grid_pinpoints,
                                                 cfg.vision_config.image_size)
                       for s in image_sizes]
        if pixel_values.ndim == 5:
            pixel_values = jnp.concatenate(
                [pv[:n] for pv, n in zip(pixel_values, num_patches)], axis=0)
        out = self.vision_tower(params["vision_tower"], pixel_values,
                                output_hidden_states=True)
        layer = cfg.vision_feature_layer
        if isinstance(layer, int):
            feats = out.hidden_states[layer]
        else:
            feats = jnp.concatenate([out.hidden_states[i] for i in layer], axis=-1)
        if cfg.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        feats = self.multi_modal_projector(params["multi_modal_projector"], feats)
        splits = np.cumsum(num_patches)[:-1]
        per_image = jnp.split(feats, splits, axis=0)
        return self.pack_image_features(params, per_image, image_sizes)

    def embed_with_images(self, params, input_ids, pixel_values, image_sizes):
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where(input_ids == self.config.image_token_id, 0, input_ids))
        if pixel_values is None:
            return embeds
        feats = jnp.concatenate(
            self.get_image_features(params, pixel_values, image_sizes),
            axis=0).astype(embeds.dtype)
        mask = input_ids == self.config.image_token_id
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(feats, jnp.clip(order, 0, feats.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids,
                                                   pixel_values, image_sizes)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class LlavaNextPreTrainedModel(PreTrainedModel):
    config_class = LlavaNextConfig
    base_model_prefix = "model"


class LlavaNextForConditionalGeneration(LlavaNextPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)
    # grid geometry must stay host-static (it decides packing shapes)
    _static_prefill_input_names = ("image_sizes",)
    _weight_rules = LlavaForConditionalGeneration._weight_rules + (
        WeightRule(pattern=r"^image_newline$", rename="model.image_newline"),)

    def __init__(self, config: LlavaNextConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Linear

        self.model = LlavaNextModel(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        text_config = config.text_config
        if not text_config.tie_word_embeddings:
            self.lm_head = Linear(text_config.hidden_size, text_config.vocab_size,
                                  False, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            return self.model.language_model.embed_tokens.attend(
                params["model"]["language_model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def init_cache(self, batch_size, max_len, dtype=None,
                   implementation: str = "static"):
        from ...cache_utils import cache_from_config

        return cache_from_config(self.config.text_config, batch_size=batch_size,
                                 max_len=max_len, dtype=dtype or self.dtype,
                                 implementation=implementation)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, pixel_values,
                             image_sizes, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds,
                             output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels,
                                      self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)
