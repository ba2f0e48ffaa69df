"""Voxtral, TPU-native (reference
src/transformers/models/voxtral/modeling_voxtral.py).

Whisper-style audio encoder (conv x2 subsample to 1500 frames, pre-LN
layers, sinusoidal-init learned positions) whose output frames are
REGROUPED — every ``intermediate_size / hidden_size`` consecutive frames
concatenate into one audio token (reference get_audio_features:410
``reshape(-1, intermediate_size)``) — then a 2-layer gelu projector maps
them into the Llama text stream at <AUDIO> placeholder positions.

Unlike Qwen2-Audio there is no feature-length masking (reference forward
:294 ignores attention_mask) and no average pooling; the 4x temporal
reduction comes from the reshape."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutput, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..whisper.modeling_whisper import WhisperEncoderLayer
from .configuration_voxtral import VoxtralConfig, VoxtralEncoderConfig


class VoxtralEncoder(Module):
    """(reference VoxtralEncoder:237 — whisper encoder, no pooling)."""

    def __init__(self, config: VoxtralEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.conv1 = Conv(config.num_mel_bins, d, 3, padding=1, ndim=1, **kw)
        self.conv2 = Conv(d, d, 3, stride=2, padding=1, ndim=1, **kw)
        self.embed_positions = Embedding(config.max_source_positions, d, **kw)
        self.layers = [WhisperEncoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, input_features) -> BaseModelOutput:
        h = jax.nn.gelu(self.conv1(params["conv1"],
                                   jnp.asarray(input_features, self.dtype)),
                        approximate=False)
        h = jax.nn.gelu(self.conv2(params["conv2"], h), approximate=False)
        h = h.transpose(0, 2, 1)
        h = h + params["embed_positions"]["weight"].astype(self.dtype)[None, : h.shape[1]]
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, {"is_causal": False})
        h = self.layer_norm(params["layer_norm"], h)
        return BaseModelOutput(last_hidden_state=h)


class VoxtralMultiModalProjector(Module):
    """(reference VoxtralMultiModalProjector:349)."""

    def __init__(self, config: VoxtralConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        lk = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.linear_1 = Linear(config.audio_config.intermediate_size,
                               config.text_config.hidden_size, False, **lk)
        self.linear_2 = Linear(config.text_config.hidden_size,
                               config.text_config.hidden_size, False, **lk)
        self.act = get_activation(config.projector_hidden_act)

    def __call__(self, params, audio_features):
        h = self.act(self.linear_1(params["linear_1"], audio_features))
        return self.linear_2(params["linear_2"], h)


class VoxtralPreTrainedModel(PreTrainedModel):
    config_class = VoxtralConfig
    base_model_prefix = ""


class VoxtralForConditionalGeneration(VoxtralPreTrainedModel, GenerationMixin):
    """(reference VoxtralForConditionalGeneration:490 — in the 4.x key layout
    the language model keeps its lm_head under ``language_model.``)."""

    _prefill_input_names = ("input_features",)

    def __init__(self, config: VoxtralConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_tower = VoxtralEncoder(config.audio_config, **kw)
        self.multi_modal_projector = VoxtralMultiModalProjector(config, **kw)
        import importlib

        from ..auto.modeling_auto import MODEL_FOR_CAUSAL_LM_MAPPING_NAMES

        module_name, cls_name = MODEL_FOR_CAUSAL_LM_MAPPING_NAMES[
            config.text_config.model_type]
        lm_cls = getattr(importlib.import_module(
            f"transformers_tpu.models.{module_name}"), cls_name)
        self.language_model = lm_cls(config.text_config, **kw)

    def get_input_embedding_path(self):
        return "language_model." + self.language_model.get_input_embedding_path()

    def get_audio_embeds(self, params, input_features):
        """Encoder frames regrouped into audio tokens then projected
        (reference get_audio_features:397-411)."""
        h = self.audio_tower(params["audio_tower"], input_features).last_hidden_state
        inter = self.config.audio_config.intermediate_size
        h = h.reshape(h.shape[0], -1, inter)
        return self.multi_modal_projector(params["multi_modal_projector"], h)

    def _embed(self, params, input_ids, input_features):
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
        feats = self.get_audio_embeds(params, input_features)
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = input_ids == self.config.audio_token_id
        slot = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(slot, 0, flat.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, input_features=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self._embed(params, input_ids, input_features)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, labels,
            logits_to_keep, output_hidden_states)

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return self.language_model.init_cache(batch_size, max_len,
                                              dtype or self.dtype, implementation)
