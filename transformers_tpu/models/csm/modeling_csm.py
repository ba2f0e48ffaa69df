"""CSM / Sesame (reference models/csm/modeling_csm.py): conversational TTS.
A llama backbone runs over text embeddings interleaved with summed
per-codebook audio-frame embeddings (codes from the Mimi codec) and predicts
codebook-0 of the next frame; a small depth decoder, seeded with the
backbone's last hidden state at position 0, autoregressively predicts
codebooks 1..N-1 with a per-position codebooks head (:514)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..llama.modeling_llama import LlamaDecoderLayer
from .configuration_csm import CsmConfig, CsmDepthDecoderConfig


@dataclass
class CsmOutputWithPast(ModelOutput):
    loss: Any = None
    backbone_loss: Any = None
    depth_decoder_loss: Any = None
    logits: Any = None
    past_key_values: Any = None
    depth_decoder_logits: Any = None


class CsmBackboneModelEmbeddings(Module):
    """reference :648 — one big (num_codebooks*codebook_size) table; a frame
    embeds as the SUM of its per-codebook rows."""

    def __init__(self, config: CsmConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embed_audio_tokens = Embedding(
            config.num_codebooks * config.codebook_size, config.hidden_size,
            embedding_init=normal_init(config.initializer_range),
            dtype=dtype, param_dtype=param_dtype)
        self.offsets = jnp.arange(config.num_codebooks) * config.codebook_size

    def __call__(self, params, input_ids):  # [B, S, ncb]
        embeds = self.embed_audio_tokens(params["embed_audio_tokens"],
                                         input_ids + self.offsets)
        return embeds.sum(axis=2)


class _CsmDecoderStack(Module):
    """Shared llama layer stack driver for backbone and depth decoder."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [LlamaDecoderLayer(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def run(self, params, hidden, attention_mask, past_key_values,
            cache_position):
        b, s, _ = hidden.shape
        position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + \
            jnp.asarray(cache_position, jnp.int32)
        position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=self.dtype)
        kv_len = past_key_values.max_len if past_key_values is not None else s
        kv_valid = attention_mask if attention_mask is not None \
            else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": position_ids, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin,
                                  attn_args, cache, cache_position)
        return self.norm(params["norm"], hidden), cache


class CsmBackboneModel(_CsmDecoderStack):
    def __init__(self, config: CsmConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = CsmBackboneModelEmbeddings(
            config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        return self.run(params, inputs_embeds, attention_mask,
                        past_key_values, cache_position)


class CsmDepthDecoderModel(_CsmDecoderStack):
    """reference :411 — embeds codebook tokens with a position-dependent
    vocabulary offset, swaps position 0 for the backbone hidden state, and
    projects backbone_hidden -> depth hidden."""

    def __init__(self, config: CsmDepthDecoderConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size
        self.embed_tokens = Embedding(
            config.num_codebooks * config.vocab_size,
            config.backbone_hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        self.inputs_embeds_projector = Linear(
            config.backbone_hidden_size, config.hidden_size, use_bias=False, **kw)

    def __call__(self, params, input_ids=None,
                 backbone_last_hidden_state=None, attention_mask=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None):
        if inputs_embeds is None:
            b, s = input_ids.shape
            positions = jnp.arange(s) + jnp.asarray(cache_position, jnp.int32)
            codebook_idxs = jnp.clip(positions - 1, 0, None)
            inputs_embeds = self.embed_tokens(
                params["embed_tokens"],
                input_ids + codebook_idxs[None] * self.vocab_size)
            if backbone_last_hidden_state is not None:
                inputs_embeds = inputs_embeds.at[:, 0].set(
                    backbone_last_hidden_state.astype(inputs_embeds.dtype))
        inputs_embeds = self.inputs_embeds_projector(
            params["inputs_embeds_projector"], inputs_embeds)
        return self.run(params, inputs_embeds, attention_mask,
                        past_key_values, cache_position)


class CsmCodebooksHead(Module):
    """reference :514 — a distinct (hidden, vocab) projection per codebook
    position 1..N-1."""

    def __init__(self, hidden_size, num_codebooks, vocab_size, *, dtype,
                 param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = (num_codebooks - 1, hidden_size, vocab_size)

    def init(self, rng):
        return {"weight": normal_init(0.02)(rng, self.shape, self.param_dtype)}

    def __call__(self, params, hidden, codebook_indices):
        w = jnp.take(params["weight"].astype(hidden.dtype),
                     codebook_indices - 1, axis=0)
        return jnp.einsum("bnd,ndv->bnv", hidden, w)


class _DepthDecoderWrapper(Module):
    """Checkpoint shape: depth_decoder.{model, codebooks_head}."""

    def __init__(self, config: CsmDepthDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.model = CsmDepthDecoderModel(config, **kw)
        self.codebooks_head = CsmCodebooksHead(
            config.hidden_size, config.num_codebooks, config.vocab_size, **kw)


class CsmPreTrainedModel(PreTrainedModel):
    config_class = CsmConfig
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r".*num_batches_tracked$",)


class CsmForConditionalGeneration(CsmPreTrainedModel):
    """reference :752 — backbone + depth decoder + Mimi codec."""

    main_input_name = "input_ids"

    def __init__(self, config: CsmConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                              kernel_init=normal_init(0.02), **kw)
        self.embed_text_tokens = Embedding(
            config.text_vocab_size, config.hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        self.backbone_model = CsmBackboneModel(config, **kw)
        self.depth_decoder = _DepthDecoderWrapper(config.depth_decoder_config, **kw)
        from ..mimi.modeling_mimi import MimiModel

        self.codec_model = MimiModel(config.codec_config, dtype=self.dtype,
                                     param_dtype=self.param_dtype)

    def tie_weights(self, params):
        params = super().tie_weights(params)
        if self.config.tie_codebooks_embeddings:
            # reference _tied_weights_keys: backbone audio table <- depth
            # decoder table (same (ncb*vocab, backbone_hidden) shape)
            try:
                src = params["depth_decoder"]["model"]["embed_tokens"]["weight"]
                params["backbone_model"]["embed_tokens"][
                    "embed_audio_tokens"]["weight"] = src
            except KeyError:
                pass
        return params

    # ------------------------------------------------------------ merge
    def _merge(self, params, input_ids, input_values=None,
               input_values_cutoffs=None):
        """Text embeds with Mimi-encoded audio frames at <audio> placeholders
        (reference _merge_input_ids_with_input_values :824). Host-side: the
        codec runs per audio segment with dynamic lengths."""
        cfg = self.config
        embeds = self.embed_text_tokens(params["embed_text_tokens"],
                                        jnp.asarray(input_ids))
        if input_values is None:
            return embeds
        ids_np = np.asarray(input_ids)
        cut_np = np.asarray(input_values_cutoffs)
        audio_frames = []  # per batch row, [frames, ncb]
        for b in range(ids_np.shape[0]):
            cuts = [0] + [int(c) for c in cut_np[b] if c >= 0]
            for i in range(len(cuts) - 1):
                seg = np.asarray(input_values)[b:b + 1, :, cuts[i]:cuts[i + 1]]
                codes = self.codec_model.encode(
                    params["codec_model"], jnp.asarray(seg)).audio_codes
                audio_frames.append(np.asarray(codes)[0].T)  # [frames, ncb]
        all_frames = jnp.asarray(np.concatenate(audio_frames, axis=0))
        frame_embeds = self.backbone_model.embed_tokens(
            params["backbone_model"]["embed_tokens"], all_frames[None])[0]
        mask = ids_np == cfg.audio_token_id
        embeds_np = np.array(embeds)
        embeds_np[mask] = np.asarray(frame_embeds)[:mask.sum()]
        # audio-EOS frames embed as the all-eos codebook frame
        eos_frame = jnp.full((1, 1, cfg.num_codebooks),
                             cfg.codebook_eos_token_id, jnp.int32)
        eos_embed = np.asarray(self.backbone_model.embed_tokens(
            params["backbone_model"]["embed_tokens"], eos_frame))[0, 0]
        eos_mask = ids_np == cfg.audio_eos_token_id
        embeds_np[eos_mask] = eos_embed
        return jnp.asarray(embeds_np)

    def __call__(self, params, input_ids=None, input_values=None,
                 input_values_cutoffs=None, attention_mask=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 **kwargs) -> CsmOutputWithPast:
        if input_ids is not None and np.asarray(input_ids).ndim == 2:
            inputs_embeds = self._merge(params, input_ids, input_values,
                                        input_values_cutoffs)
            input_ids = None
        hidden, cache = self.backbone_model(
            params["backbone_model"], input_ids, attention_mask,
            past_key_values, cache_position, inputs_embeds)
        if logits_to_keep:
            hidden_l = hidden[:, -logits_to_keep:, :]
        else:
            hidden_l = hidden
        logits = self.lm_head(params["lm_head"], hidden_l)
        return CsmOutputWithPast(logits=logits, past_key_values=cache)

    # ------------------------------------------------------- generation
    def generate_frames(self, params, input_ids, input_values=None,
                        input_values_cutoffs=None, max_new_frames=16):
        """Greedy two-level decode (reference CsmGenerationMixin semantics):
        the backbone emits codebook-0 per frame; the depth decoder fills the
        remaining codebooks seeded by the backbone hidden state. Stops when
        codebook-0 == codebook_eos_token_id. Returns [B, frames, ncb]."""
        cfg = self.config
        embeds = self._merge(params, input_ids, input_values,
                             input_values_cutoffs)
        b, s, _ = embeds.shape
        total = s + max_new_frames
        cache = init_static_cache(
            num_layers=cfg.num_hidden_layers, batch_size=b, max_len=total,
            num_kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            dtype=self.dtype, layer_windows=(None,) * cfg.num_hidden_layers,
            layout="bhsd")
        mask = np.zeros((b, total), np.int32)
        mask[:, :s] = 1
        hidden, cache = self.backbone_model(
            params["backbone_model"], None, jnp.asarray(mask), cache, 0, embeds)
        frames = []
        last_hidden = hidden[:, -1]
        pos = s
        for _ in range(max_new_frames):
            c0 = jnp.argmax(self.lm_head(params["lm_head"], last_hidden), -1)
            if int(np.asarray(c0)[0]) == cfg.codebook_eos_token_id:
                break
            frame = self._depth_fill(params, c0, last_hidden)
            frames.append(np.asarray(frame))
            mask[:, pos] = 1
            embeds_f = self.backbone_model.embed_tokens(
                params["backbone_model"]["embed_tokens"], frame[:, None])
            hidden, cache = self.backbone_model(
                params["backbone_model"], None, jnp.asarray(mask), cache, pos,
                embeds_f)
            last_hidden = hidden[:, -1]
            pos += 1
        if not frames:
            return np.zeros((b, 0, cfg.num_codebooks), np.int32)
        return np.stack(frames, axis=1)

    def _depth_fill(self, params, c0, backbone_hidden):
        """Greedy depth decode of codebooks 1..N-1 for one frame."""
        cfg = self.config
        b = c0.shape[0]
        ids = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), c0[:, None].astype(jnp.int32)], 1)
        frame = [c0.astype(jnp.int32)]
        dp = params["depth_decoder"]
        for k in range(1, cfg.num_codebooks):
            hidden, _ = self.depth_decoder.model(
                dp["model"], ids, backbone_last_hidden_state=backbone_hidden)
            logits = self.depth_decoder.codebooks_head(
                dp["codebooks_head"], hidden[:, -1:],
                jnp.asarray([k]))
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            frame.append(nxt)
            if k < cfg.num_codebooks - 1:
                ids = jnp.concatenate([ids, nxt[:, None]], 1)
        return jnp.stack(frame, axis=1)
