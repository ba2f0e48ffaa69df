"""Qwen2-Audio (reference src/transformers/models/qwen2_audio/modeling_qwen2_audio.py).

Whisper-style audio encoder (conv x2 subsample, post-LN layers, padding mask
from feature lengths) + stride-2 average pooling + LayerNorm → linear
projector → audio embeddings scattered at <|AUDIO|> placeholder positions in
the Qwen2 decoder sequence (same contract as LLaVA)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutput, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..whisper.modeling_whisper import WhisperEncoderLayer
from .configuration_qwen2_audio import Qwen2AudioConfig, Qwen2AudioEncoderConfig


def feat_extract_output_lengths(input_lengths):
    """(reference Qwen2AudioEncoder._get_feat_extract_output_lengths)."""
    feat = (input_lengths - 1) // 2 + 1
    out = (feat - 2) // 2 + 1
    return feat, out


class Qwen2AudioEncoder(Module):
    def __init__(self, config: Qwen2AudioEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.conv1 = Conv(config.num_mel_bins, d, 3, padding=1, ndim=1, **kw)
        self.conv2 = Conv(d, d, 3, stride=2, padding=1, ndim=1, **kw)
        self.embed_positions = Embedding(config.max_source_positions, d, **kw)
        self.layers = [WhisperEncoderLayer(config, **kw)
                       for _ in range(config.encoder_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, input_features, feature_lengths=None) -> BaseModelOutput:
        h = jax.nn.gelu(self.conv1(params["conv1"],
                                   jnp.asarray(input_features, self.dtype)),
                        approximate=False)
        h = jax.nn.gelu(self.conv2(params["conv2"], h), approximate=False)
        h = h.transpose(0, 2, 1)
        pos = params["embed_positions"]["weight"].astype(self.dtype)[None, : h.shape[1]]
        h = h + pos
        attn_args = {"is_causal": False}
        if feature_lengths is not None:
            feat_len, _ = feat_extract_output_lengths(feature_lengths)
            kv_valid = (jnp.arange(h.shape[1])[None, :] < feat_len[:, None]).astype(jnp.int32)
            attn_args["kv_valid"] = kv_valid
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
        # stride-2 average pool over time, then LN (reference avg_pooler)
        t = h.shape[1] // 2
        h = h[:, : t * 2].reshape(h.shape[0], t, 2, h.shape[-1]).mean(axis=2)
        h = self.layer_norm(params["layer_norm"], h)
        return BaseModelOutput(last_hidden_state=h)


class Qwen2AudioMultiModalProjector(Module):
    def __init__(self, config: Qwen2AudioConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.linear = Linear(config.audio_config.d_model,
                             config.text_config.hidden_size, True, dtype=dtype,
                             param_dtype=param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.linear(params["linear"], x)


class Qwen2AudioPreTrainedModel(PreTrainedModel):
    config_class = Qwen2AudioConfig
    base_model_prefix = ""


class Qwen2AudioForConditionalGeneration(Qwen2AudioPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("input_features", "feature_attention_mask")

    def __init__(self, config: Qwen2AudioConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_tower = Qwen2AudioEncoder(config.audio_config, **kw)
        self.multi_modal_projector = Qwen2AudioMultiModalProjector(config, **kw)
        from ..auto.modeling_auto import MODEL_FOR_CAUSAL_LM_MAPPING_NAMES
        import importlib

        module_name, cls_name = MODEL_FOR_CAUSAL_LM_MAPPING_NAMES[
            config.text_config.model_type]
        lm_cls = getattr(importlib.import_module(
            f"transformers_tpu.models.{module_name}"), cls_name)
        self.language_model = lm_cls(config.text_config, **kw)

    def get_input_embedding_path(self):
        return "language_model." + self.language_model.get_input_embedding_path()

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def _embed(self, params, input_ids, input_features, feature_attention_mask):
        lm = self.language_model
        path = lm.get_input_embedding_path().split(".")[:-1]
        mod, sub = lm, params["language_model"]
        for name in path:
            mod = getattr(mod, name)
            sub = sub[name]
        safe_ids = jnp.where(input_ids == self.config.audio_token_id, 0, input_ids)
        embeds = mod(sub, safe_ids)
        if input_features is None:
            return embeds
        lengths = (feature_attention_mask.sum(-1)
                   if feature_attention_mask is not None
                   else jnp.full((input_features.shape[0],), input_features.shape[-1]))
        audio_out = self.audio_tower(params["audio_tower"], input_features, lengths)
        feats = self.multi_modal_projector(params["multi_modal_projector"],
                                           audio_out.last_hidden_state)
        # keep only the valid (unpadded) audio positions, concatenated
        _, out_lengths = feat_extract_output_lengths(lengths)
        valid = jnp.arange(feats.shape[1])[None, :] < out_lengths[:, None]
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        valid_flat = valid.reshape(-1)
        # stable partition: valid rows first, original order preserved (the
        # audio-token count in input_ids equals sum(out_lengths) — processor
        # contract)
        packed = jnp.take(flat, jnp.argsort(~valid_flat, stable=True), axis=0)
        mask = input_ids == self.config.audio_token_id
        slot = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(packed, jnp.clip(slot, 0, packed.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, input_features=None,
                 feature_attention_mask=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self._embed(params, input_ids, input_features,
                                        feature_attention_mask)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, labels, logits_to_keep,
            output_hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return self.language_model.init_cache(batch_size, max_len,
                                              dtype or self.dtype, implementation)
