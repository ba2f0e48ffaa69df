"""Gemma3 text decoder (reference models/gemma3/modeling_gemma3.py).

Gemma2 sandwich-norm skeleton plus: per-head zero-centered q/k RMSNorm and
DUAL rotary tables — global rope (scaled theta 1M) for full-attention layers,
local rope (theta 10k) for sliding layers — selected per layer type.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.loading import WeightRule
from ...core.module import Module, RMSNorm
from ...generation.utils import GenerationMixin
from ...modeling_utils import PreTrainedModel
from ...ops.rope import compute_cos_sin, rope_inv_freq, _default_inv_freq
from ..gemma2.modeling_gemma2 import Gemma2DecoderLayer, Gemma2MLP
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_gemma3 import Gemma3Config, Gemma3TextConfig


class Gemma3Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, scale_offset=1.0, **kw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, scale_offset=1.0, **kw)


class Gemma3DecoderLayer(Gemma2DecoderLayer):
    attention_cls = Gemma3Attention
    mlp_cls = Gemma2MLP


class Gemma3TextModel(LlamaModel):
    decoder_layer_cls = Gemma3DecoderLayer
    scale_embeddings = True

    def __init__(self, config: Gemma3TextConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # local rope table for sliding layers (reference Gemma3TextModel:
        # rope_local_base_freq, no scaling)
        class _LocalCfg:
            rope_theta = config.rope_local_base_freq
            head_dim = config.head_dim
            hidden_size = config.hidden_size
            num_attention_heads = config.num_attention_heads
            partial_rotary_factor = 1.0
            rope_scaling = None

        self.local_inv_freq = _default_inv_freq(_LocalCfg)

    def compute_rope(self, position_ids):
        global_rope = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                      dtype=self.dtype)
        local_rope = compute_cos_sin(position_ids, self.local_inv_freq, 1.0, dtype=self.dtype)
        return {"global": global_rope, "local": local_rope}

    def rope_for_layer(self, rope, layer_idx):
        if self.config.layer_types[layer_idx] == "sliding_attention":
            return rope["local"]
        return rope["global"]


class Gemma3ForCausalLM(LlamaForCausalLM):
    config_class = Gemma3TextConfig
    model_cls = Gemma3TextModel


class Gemma3TextModelStandalone(LlamaModelStandalone):
    config_class = Gemma3TextConfig
    model_cls = Gemma3TextModel


# --------------------------------------------------------------------------
# Multimodal half (reference modeling_gemma3.py:662-1030): SigLIP tower ->
# avg-pool + soft-emb RMSNorm + linear projector -> image embeds scattered at
# image-token slots; image-token runs attend bidirectionally via the
# blockwise mask overlay (reference :698 get_block_sequence_ids_for_mask).
# --------------------------------------------------------------------------


class Gemma3MultiModalProjector(Module):
    """Reference modeling_gemma3.py:662: [B, P, Hv] patches are avg-pooled
    down to ``mm_tokens_per_image`` soft tokens, RMS-normed (gemma 1+w
    parameterization, zero-init weight) and projected with a raw
    [Hv, Ht] matrix (checkpoint key ``mm_input_projection_weight``)."""

    def __init__(self, config: "Gemma3Config", *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        vision = config.vision_config
        self.vision_hidden = vision.hidden_size
        self.text_hidden = config.text_config.hidden_size
        self.mm_soft_emb_norm = RMSNorm(vision.hidden_size, vision.layer_norm_eps,
                                        scale_offset=1.0, dtype=dtype,
                                        param_dtype=param_dtype)
        self.patches_per_image = vision.image_size // vision.patch_size
        self.tokens_per_side = int(config.mm_tokens_per_image ** 0.5)
        self.kernel_size = max(self.patches_per_image // self.tokens_per_side, 1)

    def init(self, rng):
        params = super().init(rng)
        params["mm_input_projection_weight"] = jnp.zeros(
            (self.vision_hidden, self.text_hidden), self.param_dtype)
        return params

    def __call__(self, params, vision_outputs):
        b, p, h = vision_outputs.shape
        side, k = self.patches_per_image, self.kernel_size
        x = vision_outputs.reshape(b, side, side, h)
        t = side // k
        # AvgPool2d(kernel=k, stride=k) == block-mean over k×k patch tiles
        x = x.reshape(b, t, k, t, k, h).mean(axis=(2, 4))
        x = x.reshape(b, t * t, h)
        x = self.mm_soft_emb_norm(params["mm_soft_emb_norm"], x)
        w = params["mm_input_projection_weight"].astype(self.dtype)
        return jnp.dot(x.astype(self.dtype), w)


class Gemma3Model(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ..siglip.modeling_siglip import SiglipVisionModel

        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_tower = SiglipVisionModel(config.vision_config, **kw)
        self.multi_modal_projector = Gemma3MultiModalProjector(config, **kw)
        self.language_model = Gemma3TextModel(config.text_config, **kw)

    def get_image_features(self, params, pixel_values):
        out = self.vision_tower(params["vision_tower"], pixel_values)
        return self.multi_modal_projector(params["multi_modal_projector"],
                                          out.last_hidden_state)

    def embed_with_images(self, params, input_ids, pixel_values):
        # text embeds are scaled by sqrt(hidden) inside the scaled embedding
        # (reference Gemma3TextScaledWordEmbedding:111); scattered image
        # features are NOT rescaled.
        image_token = self.config.image_token_index
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where(input_ids == image_token, 0, input_ids))
        embeds = embeds * self.language_model.embed_scale()
        if pixel_values is not None:
            feats = self.get_image_features(params, pixel_values)
            flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
            mask = input_ids == image_token
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
            embeds = jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)
        return embeds

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, token_type_ids=None, output_hidden_states=False):
        if token_type_ids is None and input_ids is not None:
            # the processor marks image tokens with token_type_ids == 1;
            # without it the image-token id itself is the marker
            token_type_ids = (input_ids == self.config.image_token_index).astype(jnp.int32)
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states,
            token_type_ids=token_type_ids)


class Gemma3PreTrainedModel(PreTrainedModel):
    config_class = Gemma3Config
    base_model_prefix = "model"


class Gemma3ForConditionalGeneration(Gemma3PreTrainedModel, GenerationMixin):
    """Reference modeling_gemma3.py:925."""
    _prefill_input_names = ("pixel_values",)
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^vision_tower\.", rename="model.vision_tower."),
        WeightRule(pattern=r"^multi_modal_projector\.", rename="model.multi_modal_projector."),
    )

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = Gemma3Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
        text_config = config.text_config
        if not text_config.tie_word_embeddings:
            from ...core.module import Linear, normal_init

            self.lm_head = Linear(text_config.hidden_size, text_config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            logits = self.model.language_model.embed_tokens.attend(
                params["model"]["language_model"]["embed_tokens"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        cap = getattr(self.config.text_config, "final_logit_softcapping", None)
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        return logits

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, token_type_ids=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states=False, **kwargs):
        from ...modeling_outputs import CausalLMOutputWithPast

        outputs = self.model(params["model"], input_ids, pixel_values, attention_mask,
                             position_ids, past_key_values, cache_position, inputs_embeds,
                             token_type_ids, output_hidden_states)
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
