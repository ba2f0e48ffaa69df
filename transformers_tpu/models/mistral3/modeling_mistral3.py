"""Mistral3 (Mistral-Small-3.1 VLM), TPU-native (reference
src/transformers/models/mistral3/modeling_mistral3.py).

Pixtral vision tower -> RMSNorm -> spatial patch merger (s x s unfold +
linear) -> 2-layer projector -> image tokens scattered into the mistral
text sequence (llava composition pattern).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...cache_utils import cache_from_config
from ...core.loading import WeightRule
from ...core.module import Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..llava.modeling_llava import _language_model_cls
from ..pixtral.modeling_pixtral import PixtralVisionModel
from .configuration_mistral3 import Mistral3Config


class Mistral3PatchMerger(Module):
    """Learned merge of spatial_merge_size^2 neighboring patches (:61)."""

    def __init__(self, config: Mistral3Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.s = config.spatial_merge_size
        self.patch_size = config.vision_config.patch_size
        h = config.vision_config.hidden_size
        self.merging_layer = Linear(h * self.s ** 2, h, False,
                                    dtype=dtype, param_dtype=param_dtype,
                                    kernel_init=normal_init(0.02))

    def __call__(self, params, image_features, grid_hw):
        """image_features [1, N*g, D] with uniform per-image grids grid_hw."""
        gh, gw = grid_hw
        s = self.s
        d = image_features.shape[-1]
        x = image_features.reshape(-1, gh, gw, d)                 # [N, gh, gw, D]
        x = x.reshape(-1, gh // s, s, gw // s, s, d)
        # torch unfold layout: channel-major then (ki, kj)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(-1, (gh // s) * (gw // s), d * s * s)
        return self.merging_layer(params["merging_layer"], x).reshape(
            1, -1, self.merging_layer.out_features)


class Mistral3MultiModalProjector(Module):
    def __init__(self, config: Mistral3Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm = RMSNorm(config.vision_config.hidden_size,
                            config.text_config.rms_norm_eps, **kw)
        self.patch_merger = Mistral3PatchMerger(config, **kw)
        n_layers = 1 if isinstance(config.vision_feature_layer, int) else len(config.vision_feature_layer)
        lk = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.linear_1 = Linear(config.vision_config.hidden_size * n_layers,
                               config.text_config.hidden_size,
                               config.multimodal_projector_bias, **lk)
        self.linear_2 = Linear(config.text_config.hidden_size,
                               config.text_config.hidden_size,
                               config.multimodal_projector_bias, **lk)
        self.act = get_activation(config.projector_hidden_act)

    def __call__(self, params, image_features, grid_hw):
        h = self.norm(params["norm"], image_features)
        h = self.patch_merger(params["patch_merger"], h, grid_hw)
        h = self.act(self.linear_1(params["linear_1"], h))
        return self.linear_2(params["linear_2"], h)


class Mistral3Model(Module):
    def __init__(self, config: Mistral3Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_tower = PixtralVisionModel(config.vision_config, **kw)
        self.multi_modal_projector = Mistral3MultiModalProjector(config, **kw)
        lm = _language_model_cls(config.text_config.model_type)(config.text_config, **kw)
        self.language_model = lm.model

    def get_image_features(self, params, pixel_values):
        layer = self.config.vision_feature_layer
        out = self.vision_tower(params["vision_tower"], pixel_values,
                                output_hidden_states=True)
        feats = (out.hidden_states[layer] if isinstance(layer, int)
                 else jnp.concatenate([out.hidden_states[i] for i in layer], axis=-1))
        p = self.config.vision_config.patch_size
        grid_hw = (pixel_values.shape[2] // p, pixel_values.shape[3] // p)
        return self.multi_modal_projector(params["multi_modal_projector"], feats, grid_hw)

    def embed_with_images(self, params, input_ids, pixel_values):
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where(input_ids == self.config.image_token_id, 0, input_ids))
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
                 inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class Mistral3PreTrainedModel(PreTrainedModel):
    config_class = Mistral3Config
    base_model_prefix = "model"


class Mistral3ForConditionalGeneration(Mistral3PreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
    )

    def __init__(self, config: Mistral3Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = Mistral3Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
        text_config = config.text_config
        if not text_config.tie_word_embeddings:
            self.lm_head = Linear(text_config.hidden_size, text_config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            return self.model.language_model.embed_tokens.attend(
                params["model"]["language_model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, pixel_values, attention_mask,
                             position_ids, past_key_values, cache_position,
                             inputs_embeds, output_hidden_states)
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
