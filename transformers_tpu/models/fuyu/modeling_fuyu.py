"""Fuyu, TPU-native (reference src/transformers/models/fuyu/modeling_fuyu.py).

Decoder-only multimodal: raw image patches are linearly projected
(`vision_embed_tokens`) and scattered into the Persimmon decoder sequence at
<image> placeholder positions — no vision tower at all.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.loading import WeightRule
from ...core.module import Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..persimmon.modeling_persimmon import PersimmonModel
from .configuration_fuyu import FuyuConfig


class FuyuModel(Module):
    """reference FuyuModel: language_model + vision_embed_tokens."""

    def __init__(self, config: FuyuConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.language_model = PersimmonModel(config.text_config, **kw)
        patch_dim = config.patch_size * config.patch_size * config.num_channels
        self.vision_embed_tokens = Linear(patch_dim, config.hidden_size, True,
                                          kernel_init=normal_init(0.02), **kw)

    def embed_with_images(self, params, input_ids, image_patches):
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where(input_ids == self.config.image_token_id, 0, input_ids))
        if image_patches is None:
            return embeds
        feats = self.vision_embed_tokens(
            params["vision_embed_tokens"],
            jnp.asarray(image_patches, self.dtype))
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = input_ids == self.config.image_token_id
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, image_patches=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, image_patches)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class FuyuPreTrainedModel(PreTrainedModel):
    config_class = FuyuConfig
    base_model_prefix = "model"


class FuyuForCausalLM(FuyuPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("image_patches",)
    # Legacy (pre-v5) checkpoint layout -> composed layout, fused with the
    # Persimmon q/k_layernorm -> q/k_norm rename (loader applies one rule/key).
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.(.*\.self_attn\.)q_layernorm(\..*)",
                   rename=r"model.language_model.\1q_norm\2"),
        WeightRule(pattern=r"^language_model\.model\.(.*\.self_attn\.)k_layernorm(\..*)",
                   rename=r"model.language_model.\1k_norm\2"),
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^vision_embed_tokens\.", rename="model.vision_embed_tokens."),
    )

    def __init__(self, config: FuyuConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = FuyuModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.text_config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.text_config.vocab_size,
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

    def __call__(self, params, input_ids=None, image_patches=None,
                 image_patches_indices=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, image_patches,
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
