"""Whisper, TPU-native (reference src/transformers/models/whisper/modeling_whisper.py:
encoder/decoder :540/:649, WhisperForConditionalGeneration :963).

Encoder-decoder with pre-norm blocks. Decode-time design (SURVEY §7): the
encoder runs once; every decoder layer's cross-attention K/V are precomputed
from the encoder output (``precompute_cross_kv``) and threaded as constants
through the jitted ``lax.while_loop`` decode — the reference's
EncoderDecoderCache (cache_utils.py:1940) collapses to (static self-attn
cache, per-layer cross K/V tuple).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.configuration_utils import GenerationConfig
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput, Seq2SeqModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_whisper import WhisperConfig


class WhisperAttention(Module):
    """q/v/out with bias, k without (reference WhisperAttention)."""

    def __init__(self, embed_dim, num_heads, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        self.q_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.k_proj = Linear(embed_dim, embed_dim, False, **kw)
        self.v_proj = Linear(embed_dim, embed_dim, True, **kw)
        self.out_proj = Linear(embed_dim, embed_dim, True, **kw)

    def kv(self, params, hidden):
        b, s, e = hidden.shape
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, kv_hidden=None, kv_precomputed=None,
                 attn_args=None, cache: Optional[StaticKVCache] = None,
                 layer_idx: int = 0, cache_position=0):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, kv_hidden if kv_hidden is not None else hidden)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **(attn_args or {"is_causal": False}))
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class WhisperEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = WhisperAttention(d, config.encoder_attention_heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.encoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.encoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args=None):
        residual = hidden
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, _ = self.self_attn(params["self_attn"], h,
                              attn_args=attn_args or {"is_causal": False})
        hidden = residual + h
        residual = hidden
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return residual + h


class WhisperEncoder(Module):
    """Conv subsample (x2) + sinusoid-initialized learned positions
    (reference modeling_whisper.py:540)."""

    def __init__(self, config: WhisperConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.conv1 = Conv(config.num_mel_bins, d, 3, padding=1, ndim=1, **kw)
        self.conv2 = Conv(d, d, 3, stride=2, padding=1, ndim=1, **kw)
        self.embed_positions = Embedding(config.max_source_positions, d, **kw)
        self.layers = [WhisperEncoderLayer(config, **kw) for _ in range(config.encoder_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, input_features) -> BaseModelOutput:
        # input_features [B, n_mels, 3000]
        h = jax.nn.gelu(self.conv1(params["conv1"], input_features.astype(self.dtype)), approximate=False)
        h = jax.nn.gelu(self.conv2(params["conv2"], h), approximate=False)
        h = h.transpose(0, 2, 1)  # [B, T, d]
        pos = params["embed_positions"]["weight"].astype(self.dtype)[None, : h.shape[1]]
        h = h + pos
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h)
        h = self.layer_norm(params["layer_norm"], h)
        return BaseModelOutput(last_hidden_state=h)


class WhisperDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = WhisperAttention(d, config.decoder_attention_heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.encoder_attn = WhisperAttention(d, config.decoder_attention_heads, config, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.decoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.decoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, cross_kv, attn_args, cache, layer_idx, cache_position):
        residual = hidden
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, attn_args=attn_args, cache=cache,
                                  layer_idx=layer_idx, cache_position=cache_position)
        hidden = residual + h
        residual = hidden
        h = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden)
        h, _ = self.encoder_attn(params["encoder_attn"], h, kv_precomputed=cross_kv,
                                 attn_args={"is_causal": False})
        hidden = residual + h
        residual = hidden
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return residual + h, cache


class WhisperDecoder(Module):
    def __init__(self, config: WhisperConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.embed_tokens = Embedding(config.vocab_size, d, embedding_init=normal_init(config.init_std), **kw)
        self.embed_positions = Embedding(config.max_target_positions, d, **kw)
        self.layers = [WhisperDecoderLayer(config, **kw) for _ in range(config.decoder_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)
        self.embed_scale = float(np.sqrt(d)) if config.scale_embedding else 1.0

    def precompute_cross_kv(self, params, encoder_hidden):
        """Per-layer cross-attention K/V from the encoder output."""
        out = []
        for i, layer in enumerate(self.layers):
            out.append(layer.encoder_attn.kv(params["layers"][str(i)]["encoder_attn"], encoder_hidden))
        return tuple(out)

    def __call__(self, params, input_ids, cross_kv, cache: Optional[StaticKVCache] = None,
                 cache_position=0, attention_mask=None):
        b, s = input_ids.shape
        h = self.embed_tokens(params["embed_tokens"], input_ids) * self.embed_scale
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        h = h + self.embed_positions(params["embed_positions"], positions)[None]
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.broadcast_to(positions[None, :], (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        for i, layer in enumerate(self.layers):
            h, cache = layer(params["layers"][str(i)], h, cross_kv[i], attn_args, cache, i, cache_position)
        h = self.layer_norm(params["layer_norm"], h)
        return h, cache


class WhisperModel(Module):
    def __init__(self, config: WhisperConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = WhisperEncoder(config, dtype=dtype, param_dtype=param_dtype)
        self.decoder = WhisperDecoder(config, dtype=dtype, param_dtype=param_dtype)


class WhisperPreTrainedModel(PreTrainedModel):
    config_class = WhisperConfig
    base_model_prefix = "model"
    main_input_name = "input_features"


class WhisperForConditionalGeneration(WhisperPreTrainedModel):
    """reference modeling_whisper.py:963 (proj_out tied to decoder embeddings)."""

    # proj_out.weight is a tied duplicate of decoder.embed_tokens.weight
    _keys_to_ignore_on_load_unexpected = (r"proj_out\.weight",)

    def __init__(self, config: WhisperConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = WhisperModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    def encode(self, params, input_features) -> BaseModelOutput:
        return self.model.encoder(params["model"]["encoder"], input_features)

    def compute_logits(self, params, hidden):
        table = params["model"]["decoder"]["embed_tokens"]["weight"]
        return jnp.dot(hidden.astype(self.dtype), table.astype(self.dtype).T)

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(
            num_layers=c.decoder_layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=c.decoder_attention_heads,
            head_dim=c.d_model // c.decoder_attention_heads, dtype=dtype or self.dtype,
        )

    def __call__(
        self,
        params,
        input_features=None,
        decoder_input_ids=None,
        encoder_outputs: Optional[BaseModelOutput] = None,
        past_key_values: Optional[StaticKVCache] = None,
        cache_position=0,
        decoder_attention_mask=None,
        labels=None,
        **kwargs,
    ) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_features)
        if decoder_input_ids is None and labels is not None:
            # shift right (reference shift_tokens_right)
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100,
                                          self.config.pad_token_id, decoder_input_ids)
        cross_kv = self.model.decoder.precompute_cross_kv(
            params["model"]["decoder"], encoder_outputs.last_hidden_state)
        hidden, cache = self.model.decoder(
            params["model"]["decoder"], decoder_input_ids, cross_kv,
            past_key_values, cache_position, decoder_attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(
            loss=loss, logits=logits, past_key_values=cache,
            encoder_last_hidden_state=encoder_outputs.last_hidden_state,
        )

    # ------------------------------------------------------------- generate
    def generate(
        self,
        params=None,
        input_features=None,
        generation_config: Optional[GenerationConfig] = None,
        prng_key=None,
        return_avg_logprobs: bool = False,
        **kwargs,
    ):
        """Single-chunk seq2seq generate (reference generation_whisper.py's
        short-form path): encode once -> jitted while_loop decode with
        forced/suppressed token handling. Long-form chunked seek loop lives in
        the pipeline layer."""
        params = params if params is not None else self.params
        gen = (generation_config or getattr(self, "generation_config", None) or GenerationConfig()).copy()
        gen.update(**kwargs)
        input_features = jnp.asarray(input_features)
        b = input_features.shape[0]

        start_id = gen.decoder_start_token_id or self.config.decoder_start_token_id
        eos_ids = gen.eos_token_id if gen.eos_token_id is not None else self.config.eos_token_id
        eos_ids = tuple(eos_ids) if isinstance(eos_ids, (list, tuple)) else (int(eos_ids),)
        pad_id = int(gen.pad_token_id if gen.pad_token_id is not None else (self.config.pad_token_id or eos_ids[0]))
        max_new = int(gen.max_new_tokens or 32)

        # Prompt = start token + any forced decoder ids (reference
        # generation_whisper.py forced_decoder_ids handling).
        forced = getattr(gen, "forced_decoder_ids", None) or []
        prompt = [int(start_id)] + [int(tok) for _, tok in sorted(forced)]
        prompt_len = len(prompt)
        total_len = prompt_len + max_new

        suppress = tuple(gen.suppress_tokens or ())
        begin_suppress = tuple(gen.begin_suppress_tokens or ())
        do_sample = bool(gen.do_sample)
        if prng_key is None:
            prng_key = jax.random.key(0)
        temperature = float(gen.temperature or 1.0)

        sig = (b, prompt_len, max_new, do_sample, eos_ids, pad_id, suppress, begin_suppress, temperature)
        store = getattr(self, "_gen_cache", None) or {}
        self._gen_cache = store
        if sig not in store:
            store[sig] = self._build_seq2seq_generate(
                prompt_len=prompt_len, max_new=max_new, do_sample=do_sample, eos_ids=eos_ids,
                pad_id=pad_id, suppress=suppress, begin_suppress=begin_suppress,
                temperature=temperature, total_len=total_len)
        prompt_ids = jnp.broadcast_to(jnp.asarray(prompt, jnp.int32)[None, :], (b, prompt_len))
        ids, avg_logprobs = store[sig](params, input_features, prompt_ids, prng_key)
        if return_avg_logprobs:
            return ids, avg_logprobs
        return ids

    def _build_seq2seq_generate(self, *, prompt_len, max_new, do_sample, eos_ids, pad_id,
                                suppress, begin_suppress, temperature, total_len):
        model = self

        def is_eos(tok):
            done = jnp.zeros(tok.shape, bool)
            for e in eos_ids:
                done |= tok == e
            return done

        def process_logits(logits, is_first):
            logits = logits.astype(jnp.float32)
            if suppress:
                logits = logits.at[:, jnp.asarray(suppress)].set(-jnp.inf)
            if begin_suppress:
                sup = logits.at[:, jnp.asarray(begin_suppress)].set(-jnp.inf)
                logits = jnp.where(is_first, sup, logits)
            return logits

        def sample(logits, key):
            if do_sample:
                tok = jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)
            else:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # token logprob under the PROCESSED distribution (reference
            # generate_with_fallback scores, generation_whisper.py:970)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return tok, jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]

        def fn(params, input_features, prompt_ids, key):
            b = input_features.shape[0]
            enc = model.encode(params, input_features)
            cross_kv = model.model.decoder.precompute_cross_kv(
                params["model"]["decoder"], enc.last_hidden_state)
            cache = model.init_decoder_cache(b, total_len)
            ids = jnp.full((b, total_len), pad_id, jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, prompt_ids, (0, 0))
            mask = jnp.zeros((b, total_len), jnp.int32)
            mask = mask.at[:, :prompt_len].set(1)

            hidden, cache = model.model.decoder(
                params["model"]["decoder"], prompt_ids, cross_kv, cache, 0, mask)
            key, k0 = jax.random.split(key)
            logits = model.compute_logits(params, hidden[:, -1])
            next_tok, lp0 = sample(process_logits(logits, jnp.asarray(True)), k0)
            finished = is_eos(next_tok)
            sum_logprob = lp0
            n_tokens = jnp.ones_like(lp0)

            def cond(carry):
                ids, mask, cache, g, key, tok, fin, slp, ntk = carry
                return (g < max_new) & ~jnp.all(fin)

            def body(carry):
                ids, mask, cache, g, key, tok, fin, slp, ntk = carry
                slot = prompt_len + g - 1
                ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, slot))
                mask = jax.lax.dynamic_update_slice(mask, jnp.ones((tok.shape[0], 1), jnp.int32), (0, slot))
                hidden, cache = model.model.decoder(
                    params["model"]["decoder"], tok[:, None], cross_kv, cache, slot, mask)
                key, k = jax.random.split(key)
                logits = model.compute_logits(params, hidden[:, -1])
                sampled, lp = sample(process_logits(logits, jnp.asarray(False)), k)
                new_tok = jnp.where(fin, jnp.asarray(pad_id, jnp.int32), sampled)
                slp = slp + jnp.where(fin, 0.0, lp)
                ntk = ntk + jnp.where(fin, 0.0, 1.0)
                fin = fin | is_eos(sampled)
                return (ids, mask, cache, g + 1, key, new_tok, fin, slp, ntk)

            carry = (ids, mask, cache, jnp.asarray(1, jnp.int32), key, next_tok, finished,
                     sum_logprob, n_tokens)
            ids, mask, cache, g, key, tok, fin, slp, ntk = jax.lax.while_loop(cond, body, carry)
            ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, prompt_len + g - 1))
            return ids, slp / jnp.maximum(ntk, 1.0)

        return jax.jit(fn)


class WhisperModelStandalone(WhisperPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = WhisperModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
