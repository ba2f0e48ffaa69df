"""Kyutai STT (reference
models/kyutai_speech_to_text/modeling_kyutai_speech_to_text.py): streaming
ASR — each step consumes [text_token, 32 Mimi codebooks] summed through one
offset embedding table (:207) into a Moshi-style sliding-window decoder
(gating MLPs, wrapped linears); the LM head emits the frame's text token."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import init_static_cache
from ...core.module import Embedding, Linear, Module, normal_init
from ...generation import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..llama.modeling_llama import LlamaModel
from ..moshi.modeling_moshi import MoshiDecoderLayer
from .configuration_kyutai_speech_to_text import KyutaiSpeechToTextConfig


class KyutaiSpeechToTextEmbeddings(Module):
    """reference :207 — one table of vocab + ncb*codebook_vocab + 1 rows;
    column 0 is the text token (offset 0), audio columns get per-codebook
    offsets; the audio PAD id passes through un-offset (it is the final row)."""

    def __init__(self, config: KyutaiSpeechToTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        total = config.vocab_size + config.num_codebooks * config.codebook_vocab_size + 1
        self.embed_tokens = Embedding(
            total, config.hidden_size,
            embedding_init=normal_init(config.initializer_range),
            dtype=dtype, param_dtype=param_dtype)
        offsets = np.arange(config.num_codebooks) * config.codebook_vocab_size
        offsets = offsets + config.vocab_size
        self.offsets = jnp.asarray(np.concatenate([[0], offsets]))
        self.pad_id = config.audio_pad_token_id

    def __call__(self, params, input_ids):  # [B, S, 1+ncb]
        shifted = jnp.where(input_ids == self.pad_id, input_ids,
                            input_ids + self.offsets)
        embeds = self.embed_tokens(params["embed_tokens"], shifted)
        return embeds.sum(axis=2)


class KyutaiSpeechToTextModel(LlamaModel):
    decoder_layer_cls = MoshiDecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        del self._children["embed_tokens"]
        object.__delattr__(self, "embed_tokens")
        self.embed_tokens = KyutaiSpeechToTextEmbeddings(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def embed(self, params, input_ids):
        return self.embed_tokens(params["embed_tokens"], input_ids)


class KyutaiSpeechToTextPreTrainedModel(PreTrainedModel):
    config_class = KyutaiSpeechToTextConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r".*num_batches_tracked$",)


class KyutaiSpeechToTextForConditionalGeneration(
        KyutaiSpeechToTextPreTrainedModel, GenerationMixin):
    _prefill_input_names = ()

    def __init__(self, config: KyutaiSpeechToTextConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = KyutaiSpeechToTextModel(config, **kw)
        self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                              kernel_init=normal_init(0.02), **kw)
        from ..mimi.modeling_mimi import MimiModel

        self.codec_model = MimiModel(config.codec_config, dtype=self.dtype,
                                     param_dtype=self.param_dtype)

    def tie_weights(self, params):
        if getattr(self.config, "tie_word_embeddings", False):
            try:
                emb = params["model"]["embed_tokens"]["embed_tokens"]["weight"]
                params["lm_head"]["weight"] = \
                    emb[: self.config.vocab_size].T
            except (KeyError, TypeError):
                pass
        return params

    def init_cache(self, batch_size, max_len, dtype=None,
                   implementation: str = "static"):
        c = self.config
        return init_static_cache(
            num_layers=c.num_hidden_layers, batch_size=batch_size,
            max_len=max_len, num_kv_heads=c.num_key_value_heads,
            head_dim=c.head_dim, dtype=dtype or self.dtype,
            layer_windows=(c.sliding_window,) * c.num_hidden_layers)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, attention_mask,
                             position_ids, past_key_values, cache_position,
                             inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def transcribe(self, params, input_values, max_frames=None):
        """Greedy streaming ASR: Mimi-encode the waveform, then one text
        token per frame (reference generate flow through the processor)."""
        cfg = self.config
        codes = self.codec_model.encode(
            params["codec_model"], jnp.asarray(input_values)).audio_codes
        codes = np.asarray(codes)  # [B, ncb, T]
        b, _, t = codes.shape
        t = min(t, max_frames) if max_frames else t
        cache = self.init_cache(b, t)
        text = np.full((b,), cfg.bos_token_id, np.int32)
        out = []
        for step in range(t):
            ids = np.concatenate([text[:, None], codes[:, :, step]], axis=1)
            res = self(params, input_ids=jnp.asarray(ids[:, None, :]),
                       past_key_values=cache, cache_position=step)
            cache = res.past_key_values
            text = np.asarray(jnp.argmax(res.logits[:, -1], -1)).astype(np.int32)
            out.append(text.copy())
        return np.stack(out, axis=1)
