"""DeepseekVL — SigLIP tower + MLP aligner spliced into a Llama decoder,
TPU-native (reference src/transformers/models/deepseek_vl/modeling_deepseek_vl.py).

The llava recipe with DeepSeek's aligner (linear-GELU-linear over the FULL
vision last_hidden_state, reference DeepseekVLAligner :96) and image features
scattered over image_token_id slots (:199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...generation import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..llava.modeling_llava import _language_model_cls
from ..siglip.modeling_siglip import SiglipVisionTransformer
from .configuration_deepseek_vl import DeepseekVLConfig


class DeepseekVLAligner(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.linear1 = Linear(config.vision_config.hidden_size,
                              config.text_config.hidden_size, **kw)
        self.linear2 = Linear(config.text_config.hidden_size,
                              config.text_config.hidden_size, **kw)

    def __call__(self, params, x):
        h = jax.nn.gelu(self.linear1(params["linear1"], x), approximate=False)
        return self.linear2(params["linear2"], h)


class DeepseekVLModelCore(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        # reference AutoModel.from_config flattens to the bare transformer:
        # checkpoint keys are model.vision_model.embeddings... (no extra level)
        self.vision_model = SiglipVisionTransformer(config.vision_config, **kw)
        self.aligner = DeepseekVLAligner(config, **kw)
        lm = _language_model_cls(config.text_config.model_type)(config.text_config, **kw)
        self.language_model = lm.model

    def get_image_features(self, params, pixel_values):
        out = self.vision_model(params["vision_model"], pixel_values)
        return self.aligner(params["aligner"], out.last_hidden_state)

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

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class DeepseekVLPreTrainedModel(PreTrainedModel):
    config_class = DeepseekVLConfig
    base_model_prefix = "model"


class DeepseekVLForConditionalGeneration(DeepseekVLPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values",)

    def __init__(self, config: DeepseekVLConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = DeepseekVLModelCore(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.text_config.hidden_size,
                                  config.text_config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
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

            loss = for_causal_lm_loss(logits, labels, self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        from ...cache_utils import cache_from_config

        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype, implementation=implementation)
