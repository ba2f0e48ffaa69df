"""LLaVA, TPU-native (reference src/transformers/models/llava/modeling_llava.py:
projector :87, composition :133-136, get_image_features :144,
placeholder-mask scatter :191/:248).

vision tower (CLIP/SigLIP via auto registry) -> 2-layer projector -> image
embeds scattered into the text embedding sequence at image-token positions.
The scatter is a pure ``jnp.where`` over a broadcast placeholder mask —
static shapes (the processor expands <image> to image_seq_length tokens).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.loading import WeightRule
from ...core.module import Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_llava import LlavaConfig


class LlavaMultiModalProjector(Module):
    """reference modeling_llava.py:87 (linear_1 -> act -> linear_2)."""

    def __init__(self, config: LlavaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        bias = config.multimodal_projector_bias
        num_feature_layers = 1 if isinstance(config.vision_feature_layer, int) else len(config.vision_feature_layer)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.linear_1 = Linear(config.vision_config.hidden_size * num_feature_layers,
                               config.text_config.hidden_size, bias, **kw)
        self.linear_2 = Linear(config.text_config.hidden_size, config.text_config.hidden_size, bias, **kw)
        self.act = get_activation(config.projector_hidden_act)

    def __call__(self, params, image_features):
        h = self.act(self.linear_1(params["linear_1"], image_features))
        return self.linear_2(params["linear_2"], h)


def _vision_tower_cls(model_type: str):
    if model_type == "clip_vision_model":
        from ..clip.modeling_clip import CLIPVisionModel

        return CLIPVisionModel
    if model_type == "siglip_vision_model":
        from ..siglip.modeling_siglip import SiglipVisionModel

        return SiglipVisionModel
    raise KeyError(f"Unsupported LLaVA vision tower {model_type!r}")


def _language_model_cls(model_type: str):
    import importlib

    from ..auto.modeling_auto import MODEL_MAPPING_NAMES

    module_name, class_name = MODEL_MAPPING_NAMES[model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    standalone = getattr(module, class_name)
    # LlavaModel composes the *bare* decoder (reference AutoModel.from_config
    # at modeling_llava.py:133-136); our Standalone wrapper holds it as .model
    return standalone


class LlavaModel(Module):
    """reference LlavaModel: vision_tower + multi_modal_projector + language_model."""

    projector_cls = LlavaMultiModalProjector

    def __init__(self, config: LlavaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        tower_cls = _vision_tower_cls(config.vision_config.model_type)
        self.vision_tower = tower_cls(config.vision_config, **kw)
        self.multi_modal_projector = self.projector_cls(config, **kw)
        lm_standalone = _language_model_cls(config.text_config.model_type)(config.text_config, **kw)
        # unwrap: the bare decoder module sits at .model of the standalone
        self.language_model = lm_standalone.model

    def get_image_features(self, params, pixel_values, vision_feature_layer=None,
                           vision_feature_select_strategy=None):
        """reference modeling_llava.py:144."""
        layer = vision_feature_layer if vision_feature_layer is not None else self.config.vision_feature_layer
        strategy = vision_feature_select_strategy or self.config.vision_feature_select_strategy
        out = self.vision_tower(params["vision_tower"], pixel_values, output_hidden_states=True)
        if isinstance(layer, int):
            feats = out.hidden_states[layer]
        else:
            feats = jnp.concatenate([out.hidden_states[i] for i in layer], axis=-1)
        if strategy == "default":
            feats = feats[:, 1:]
        return self.multi_modal_projector(params["multi_modal_projector"], feats)

    def embed_with_images(self, params, input_ids, pixel_values):
        """Text embeds with image features scattered at image-token slots
        (reference get_placeholder_mask :191 + masked_scatter :248)."""
        if pixel_values is None:
            # decode steps may legitimately embed a *generated* image-token id
            return self.language_model.embed_tokens(
                params["language_model"]["embed_tokens"], input_ids)
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"], jnp.where(
                input_ids == self.config.image_token_id, 0, input_ids))
        image_features = self.get_image_features(params, pixel_values)
        # flatten all images' patches then place sequentially at mask slots
        flat = image_features.reshape(-1, image_features.shape[-1]).astype(embeds.dtype)
        mask = (input_ids == self.config.image_token_id)
        # index of each True slot among all True slots (row-major order ==
        # reference masked_scatter semantics)
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
        gathered = gathered.reshape(embeds.shape)
        return jnp.where(mask[..., None], gathered, embeds)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class LlavaPreTrainedModel(PreTrainedModel):
    config_class = LlavaConfig
    base_model_prefix = "model"


class LlavaForConditionalGeneration(LlavaPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)
    # Legacy (pre-v5) checkpoint layout -> composed layout (the reference's
    # conversion_mapping.py legacy->v5 key mapping for llava).
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^vision_tower\.", rename="model.vision_tower."),
        WeightRule(pattern=r"^multi_modal_projector\.", rename="model.multi_modal_projector."),
    )

    model_cls = LlavaModel

    def __init__(self, config: LlavaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
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
        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype, implementation=implementation)
