"""GOT-OCR2 (reference models/got_ocr2/modeling_got_ocr2.py): SAM-style
ViTDet vision encoder (windowed attention + decomposed rel-pos, reused from
models/sam) -> stride-4 conv upsampling projector -> image features scattered
into a Qwen2 decoder at the image-token slots."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import cache_from_config
from ...core.loading import WeightRule
from ...core.module import Conv, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..qwen2.modeling_qwen2 import Qwen2Model
from ..sam.modeling_sam import SamVisionEncoder
from .configuration_got_ocr2 import GotOcr2Config


class GotOcr2MultiModalProjector(Module):
    """Two stride-2 convs then a linear (reference :GotOcr2MultiModalProjector)."""

    def __init__(self, config: GotOcr2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        c = config.vision_config.output_channels
        d = config.text_config.hidden_size
        self.conv_upsampler1 = Conv(c, c * 2, 3, stride=2, padding=1,
                                    use_bias=False, ndim=2, **kw)
        self.conv_upsampler2 = Conv(c * 2, d, 3, stride=2, padding=1,
                                    use_bias=False, ndim=2, **kw)
        self.multimodal_projector = Linear(d, d, True,
                                           kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, vision_embeddings):  # [B, C, H, W]
        h = self.conv_upsampler1(params["conv_upsampler1"], vision_embeddings)
        h = self.conv_upsampler2(params["conv_upsampler2"], h)
        b, d = h.shape[0], h.shape[1]
        h = h.reshape(b, d, -1).transpose(0, 2, 1)
        return self.multimodal_projector(params["multimodal_projector"], h)


class GotOcr2Model(Module):
    def __init__(self, config: GotOcr2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_tower = SamVisionEncoder(config.vision_config, **kw)
        self.multi_modal_projector = GotOcr2MultiModalProjector(config, **kw)
        self.language_model = Qwen2Model(config.text_config, **kw)

    def get_image_features(self, params, pixel_values):
        feats = self.vision_tower(params["vision_tower"],
                                  jnp.asarray(pixel_values, self.dtype))
        return self.multi_modal_projector(params["multi_modal_projector"],
                                          feats.last_hidden_state)

    def embed_with_images(self, params, input_ids, pixel_values):
        tok = self.config.image_token_id
        if pixel_values is None:
            # decode steps may legitimately embed a *generated* image-token id
            return self.language_model.embed_tokens(
                params["language_model"]["embed_tokens"], input_ids)
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where(input_ids == tok, 0, input_ids))
        feats = self.get_image_features(params, pixel_values)
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = input_ids == tok
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1),
                            axis=0).reshape(embeds.shape)
        return jnp.where(mask[..., None], gathered, embeds)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None,
                 output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class GotOcr2PreTrainedModel(PreTrainedModel):
    config_class = GotOcr2Config
    base_model_prefix = "model"


class GotOcr2ForConditionalGeneration(GotOcr2PreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)
    _weight_rules = (
        WeightRule(pattern=r"^model\.language_model\.model\.",
                   rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.model\.",
                   rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^vision_tower\.", rename="model.vision_tower."),
        WeightRule(pattern=r"^multi_modal_projector\.",
                   rename="model.multi_modal_projector."),
    )

    def __init__(self, config: GotOcr2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = GotOcr2Model(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        text = config.text_config
        if not text.tie_word_embeddings:
            self.lm_head = Linear(text.hidden_size, text.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            return self.model.language_model.embed_tokens.attend(
                params["model"]["language_model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, pixel_values,
                             attention_mask, position_ids, past_key_values,
                             cache_position, inputs_embeds, output_hidden_states)
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

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype, implementation=implementation)
