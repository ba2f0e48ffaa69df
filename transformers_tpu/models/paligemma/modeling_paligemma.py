"""PaliGemma (reference src/transformers/models/paligemma/modeling_paligemma.py).

SigLIP vision tower -> single-linear projector (:89-97) -> image embeds
scattered at image-token slots, scaled by 1/sqrt(text hidden) (:244), on a
Gemma decoder. Inference attention is PREFIX-LM: the full input prefix is
bidirectionally visible (:162-210 ``_update_causal_mask`` zeroes the causal
triangle when not training), decode steps attend to every valid cache slot.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.loading import WeightRule
from ...core.module import Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..siglip.modeling_siglip import SiglipVisionModel
from .configuration_paligemma import PaliGemmaConfig


class PaliGemmaMultiModalProjector(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.linear = Linear(config.vision_config.hidden_size,
                             config.vision_config.projection_dim, True,
                             dtype=dtype, param_dtype=param_dtype,
                             kernel_init=normal_init(0.02))

    def __call__(self, params, image_features):
        return self.linear(params["linear"], image_features)


def _language_model(config, **kw):
    import importlib

    from ..auto.modeling_auto import MODEL_MAPPING_NAMES

    module_name, class_name = MODEL_MAPPING_NAMES[config.model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    return getattr(module, class_name)(config, **kw).model


class PaliGemmaModel(Module):
    def __init__(self, config: PaliGemmaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_tower = SiglipVisionModel(config.vision_config, **kw)
        self.multi_modal_projector = PaliGemmaMultiModalProjector(config, **kw)
        self.language_model = _language_model(config.text_config, **kw)
        # prefix-LM inference (reference _update_causal_mask, eval branch)
        self.language_model.causal_attention = False

    def get_image_features(self, params, pixel_values):
        out = self.vision_tower(params["vision_tower"], pixel_values)
        feats = self.multi_modal_projector(params["multi_modal_projector"],
                                           out.last_hidden_state)
        return feats / (self.config.text_config.hidden_size**0.5)

    def embed_with_images(self, params, input_ids, pixel_values):
        # reference order: scatter feats/sqrt(h) into UNscaled token embeds,
        # then Gemma's sqrt(h) normalizer multiplies the whole sequence
        # (image contribution is net-unscaled).
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where(input_ids == self.config.image_token_id, 0, input_ids))
        if pixel_values is not None:
            feats = self.get_image_features(params, pixel_values)
            flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
            mask = input_ids == self.config.image_token_id
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
            embeds = jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)
        return embeds * self.language_model.embed_scale()

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class PaliGemmaPreTrainedModel(PreTrainedModel):
    config_class = PaliGemmaConfig
    base_model_prefix = "model"


class PaliGemmaForConditionalGeneration(PaliGemmaPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^vision_tower\.", rename="model.vision_tower."),
        WeightRule(pattern=r"^multi_modal_projector\.", rename="model.multi_modal_projector."),
    )

    def __init__(self, config: PaliGemmaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = PaliGemmaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
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
                             position_ids, past_key_values, cache_position, inputs_embeds,
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
        from ...cache_utils import cache_from_config

        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype, implementation=implementation)
