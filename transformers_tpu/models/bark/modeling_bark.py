"""Bark (reference models/bark/modeling_bark.py): text-to-speech as a cascade
of GPT-2-style token models — a causal semantic model over text tokens, a
causal coarse model that regresses the first EnCodec codebooks with a sliding
window, a non-causal fine model that iteratively in-fills the remaining
codebooks, and an EnCodec decoder that renders the codes to waveform.

Generation here runs the cascade as eager host loops with full re-forwards —
correct and simple; the static-shape jitted path for the causal stages is the
standard ``generate`` machinery once a speaker pipeline needs it."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import CausalLMOutputWithPast, MaskedLMOutput, ModelOutput
from ...modeling_utils import PreTrainedModel
from ..encodec.modeling_encodec import EncodecQuantizer, build_decoder, build_encoder
from ..luke.modeling_luke import _Container
from .configuration_bark import (
    BarkCoarseGenerationConfig,
    BarkConfig,
    BarkFineConfig,
    BarkFineGenerationConfig,
    BarkSemanticConfig,
    BarkSemanticGenerationConfig,
    BarkSubModelConfig,
)


class BarkSelfAttention(Module):
    def __init__(self, config, is_causal, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.num_heads
        self.head_dim = d // config.num_heads
        self.is_causal = is_causal
        self.att_proj = Linear(d, 3 * d, config.bias, **kw)
        self.out_proj = Linear(d, d, config.bias, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        b, s, d = hidden.shape
        qkv = self.att_proj(params["att_proj"], hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(self.head_dim)
        if self.is_causal:
            causal = jnp.tril(jnp.ones((s, s), bool))
            scores = jnp.where(causal[None, None], scores,
                               jnp.finfo(jnp.float32).min)
        if attention_mask is not None:
            scores = scores + attention_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.out_proj(params["out_proj"], out)


class BarkMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.in_proj = Linear(d, 4 * d, config.bias, **kw)
        self.out_proj = Linear(4 * d, d, config.bias, **kw)

    def __call__(self, params, h):
        h = self.in_proj(params["in_proj"], h)
        h = jax.nn.gelu(h, approximate=False)
        return self.out_proj(params["out_proj"], h)


class BarkBlock(Module):
    def __init__(self, config, is_causal, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        ln_bias = config.bias if is_causal else True
        self.layernorm_1 = LayerNorm(d, 1e-5, use_bias=ln_bias, **kw)
        self.layernorm_2 = LayerNorm(d, 1e-5, use_bias=ln_bias, **kw)
        self.attn = BarkSelfAttention(config, is_causal, **kw)
        self.mlp = BarkMLP(config, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        h = self.attn(params["attn"],
                      self.layernorm_1(params["layernorm_1"], hidden),
                      attention_mask)
        hidden = hidden + h
        h = self.mlp(params["mlp"], self.layernorm_2(params["layernorm_2"], hidden))
        return hidden + h


def _extended_mask(attention_mask):
    m = jnp.asarray(attention_mask)[:, None, None, :].astype(jnp.float32)
    return (1.0 - m) * jnp.finfo(jnp.float32).min


class BarkPreTrainedModel(PreTrainedModel):
    config_class = BarkConfig
    _keys_to_ignore_on_load_unexpected = (r"\.attn\.bias$",)


class BarkCausalModel(BarkPreTrainedModel):
    """GPT-2-like causal stage (reference BarkCausalModel)."""

    config_class = BarkSubModelConfig
    main_input_name = "input_ids"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.input_embeds_layer = Embedding(config.input_vocab_size,
                                            config.hidden_size, **kw)
        self.position_embeds_layer = Embedding(config.block_size,
                                               config.hidden_size, **kw)
        self._layers = [BarkBlock(config, is_causal=True, **kw)
                        for _ in range(config.num_layers)]
        self._children.pop("_layers", None)
        self.layers = ModuleList(self._layers)
        self.layernorm_final = LayerNorm(config.hidden_size, 1e-5,
                                         use_bias=config.bias, **kw)
        self.lm_head = Linear(config.hidden_size, config.output_vocab_size,
                              False, kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, inputs_embeds=None,
                 **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.input_embeds_layer(
                params["input_embeds_layer"], jnp.asarray(input_ids))
        s = inputs_embeds.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        pos = self.position_embeds_layer(params["position_embeds_layer"],
                                         position_ids)
        mask = _extended_mask(attention_mask) if attention_mask is not None else None
        hidden = inputs_embeds + pos
        for i, block in enumerate(self._layers):
            hidden = block(params["layers"][str(i)], hidden, mask)
        hidden = self.layernorm_final(params["layernorm_final"], hidden)
        logits = self.lm_head(params["lm_head"], hidden)
        return CausalLMOutputWithPast(logits=logits)

    # ---- eager autoregressive loop (full re-forward per step) ----
    def _greedy_loop(self, params, inputs_embeds, max_new, process_logits,
                     stop_fn=None, temperature=1.0, rng=None):
        generated = []
        embeds = inputs_embeds
        for step in range(max_new):
            logits = self(params, inputs_embeds=embeds).logits[:, -1, :]
            logits = logits.astype(jnp.float32)
            if temperature and temperature != 1.0:
                logits = logits / temperature
            logits = process_logits(logits, step) if process_logits else logits
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            generated.append(next_tok)
            if stop_fn is not None and stop_fn(logits, next_tok):
                break
            tok_embed = self.input_embeds_layer(params["input_embeds_layer"],
                                                next_tok[:, None])
            embeds = jnp.concatenate([embeds, tok_embed], axis=1)
        return jnp.stack(generated, axis=1)


class BarkSemanticModel(BarkCausalModel):
    config_class = BarkSemanticConfig
    base_model_prefix = "semantic"

    def generate(self, params, input_ids, semantic_generation_config=None,
                 history_prompt=None, attention_mask=None, max_new_tokens=None):
        gen = semantic_generation_config or BarkSemanticGenerationConfig()
        batch = input_ids.shape[0]
        max_in = gen.max_input_semantic_length
        ids = jnp.asarray(input_ids) + gen.text_encoding_offset
        if attention_mask is not None:
            ids = jnp.where(jnp.asarray(attention_mask) == 0,
                            gen.text_pad_token, ids)
        if history_prompt is not None:
            hist = jnp.asarray(history_prompt["semantic_prompt"])[-max_in:]
            hist = jnp.pad(hist, (0, max_in - hist.shape[0]),
                           constant_values=gen.eos_token_id)
        else:
            hist = jnp.full((max_in,), gen.eos_token_id, jnp.int32)
        hist = jnp.broadcast_to(hist[None], (batch, max_in))
        infer = jnp.full((batch, 1), gen.semantic_infer_token, jnp.int32)
        emb = self.input_embeds_layer
        p = params["input_embeds_layer"]
        embeds = jnp.concatenate(
            [emb(p, ids[:, :max_in]) + emb(p, hist[:, :max_in + 1]),
             emb(p, infer)], axis=1)
        # suppress non-semantic tokens except the pad/eos token
        suppress = np.zeros(self.config.output_vocab_size, bool)
        suppress[gen.semantic_vocab_size:gen.eos_token_id] = True
        suppress[gen.eos_token_id + 1:] = True
        neg = jnp.finfo(jnp.float32).min
        suppress = jnp.asarray(suppress)

        def process(logits, step):
            logits = jnp.where(suppress[None], neg, logits)
            if gen.min_eos_p:
                probs = jax.nn.softmax(logits, axis=-1)
                hit = probs[:, gen.eos_token_id] >= gen.min_eos_p
                forced = jnp.full_like(logits, neg).at[:, gen.eos_token_id].set(0.0)
                logits = jnp.where(hit[:, None], forced, logits)
            return logits

        done = {"flag": False}

        def stop(logits, next_tok):
            return bool((next_tok == gen.eos_token_id).all())

        out = self._greedy_loop(params, embeds,
                                max_new_tokens or gen.max_new_tokens,
                                process, stop_fn=stop,
                                temperature=gen.temperature)
        return out


class BarkCoarseModel(BarkCausalModel):
    config_class = BarkSubModelConfig
    base_model_prefix = "coarse_acoustics"

    def generate(self, params, semantic_output, semantic_generation_config=None,
                 coarse_generation_config=None, codebook_size=1024,
                 history_prompt=None):
        sgen = semantic_generation_config or BarkSemanticGenerationConfig()
        cgen = coarse_generation_config or BarkCoarseGenerationConfig()
        semantic_output = jnp.asarray(semantic_output)
        semantic_output = jnp.where(semantic_output == sgen.eos_token_id,
                                    cgen.coarse_semantic_pad_token,
                                    semantic_output)
        ratio = cgen.coarse_rate_hz / sgen.semantic_rate_hz * cgen.n_coarse_codebooks
        max_sem_hist = int(np.floor(cgen.max_coarse_history / ratio))
        lengths = (semantic_output != cgen.coarse_semantic_pad_token).sum(1)
        lengths = np.floor(np.asarray(lengths) * ratio / cgen.n_coarse_codebooks)
        lengths = np.round(lengths * cgen.n_coarse_codebooks).astype(int)
        max_generated = int(lengths.max())
        batch = semantic_output.shape[0]
        x_coarse = jnp.zeros((batch, 0), jnp.int32)
        base_idx = 0
        n_windows = int(np.ceil(max_generated / cgen.sliding_window_len))
        total = 0
        for _ in range(n_windows):
            sem_idx = base_idx + int(round(total / ratio))
            chunk = semantic_output[:, max(0, sem_idx - max_sem_hist):]
            chunk = chunk[:, :cgen.max_coarse_input_length]
            chunk = jnp.pad(chunk, ((0, 0), (0, cgen.max_coarse_input_length - chunk.shape[1])),
                            constant_values=cgen.coarse_semantic_pad_token)
            infer = jnp.full((batch, 1), cgen.coarse_infer_token, jnp.int32)
            inp = jnp.concatenate([chunk, infer,
                                   x_coarse[:, -cgen.max_coarse_history:]], axis=1)
            start_len = inp.shape[1]

            def process(logits, step, start_len=start_len):
                # alternating-codebook constraint (reference
                # AlternatingCodebooksLogitsProcessor): first codebook is
                # bounded to its range, the second keeps the vocab TAIL open
                is_first = step % 2 == 0
                mask = np.zeros(logits.shape[-1], bool)
                if is_first:
                    mask[sgen.semantic_vocab_size:
                         sgen.semantic_vocab_size + codebook_size] = True
                else:
                    mask[sgen.semantic_vocab_size + codebook_size:] = True
                return jnp.where(jnp.asarray(mask)[None], logits,
                                 jnp.finfo(jnp.float32).min)

            new_tokens = min(cgen.sliding_window_len, max_generated - total)
            emb = self.input_embeds_layer(params["input_embeds_layer"], inp)
            out = self._greedy_loop(params, emb, new_tokens, process,
                                    temperature=cgen.temperature)
            x_coarse = jnp.concatenate([x_coarse, out], axis=1)
            total = x_coarse.shape[1]
        return x_coarse


class BarkFineModel(BarkPreTrainedModel):
    config_class = BarkFineConfig
    base_model_prefix = "fine_acoustics"
    main_input_name = "codebook_idx"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self._embeds = [Embedding(config.input_vocab_size, config.hidden_size, **kw)
                        for _ in range(config.n_codes_total)]
        self._children.pop("_embeds", None)
        self.input_embeds_layers = ModuleList(self._embeds)
        self.position_embeds_layer = Embedding(config.block_size,
                                               config.hidden_size, **kw)
        self._layers = [BarkBlock(config, is_causal=False, **kw)
                        for _ in range(config.num_layers)]
        self._children.pop("_layers", None)
        self.layers = ModuleList(self._layers)
        self.layernorm_final = LayerNorm(config.hidden_size, 1e-5, **kw)
        self._heads = [Linear(config.hidden_size, config.output_vocab_size,
                              False, kernel_init=normal_init(0.02), **kw)
                       for _ in range(config.n_codes_given, config.n_codes_total)]
        self._children.pop("_heads", None)
        self.lm_heads = ModuleList(self._heads)

    @property
    def tied_weights_keys(self):
        if not self.config.tie_word_embeddings:
            return ()
        return tuple(
            (f"lm_heads.{i}.weight", f"input_embeds_layers.{i + 1}.weight")
            for i in range(self.config.n_codes_total - self.config.n_codes_given))

    def tie_weights(self, params):
        if self.config.tie_word_embeddings:
            for i in range(self.config.n_codes_total - self.config.n_codes_given):
                src = params["input_embeds_layers"][str(i + 1)]["weight"]
                # our Linear stores [in, out]; the embedding is [vocab, hidden]
                params["lm_heads"][str(i)] = {"weight": src.T}
        return params

    def __call__(self, params, codebook_idx=None, input_ids=None,
                 attention_mask=None, position_ids=None, inputs_embeds=None,
                 **kwargs) -> MaskedLMOutput:
        if codebook_idx == 0:
            raise ValueError("Cannot predict 0th codebook")
        if inputs_embeds is None:
            ids = jnp.asarray(input_ids)  # [B, T, n_codes_total]
            embeds = [
                layer(params["input_embeds_layers"][str(i)], ids[:, :, i])
                for i, layer in enumerate(list(self._embeds)[:codebook_idx + 1])]
            inputs_embeds = sum(embeds)
        s = inputs_embeds.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        pos = self.position_embeds_layer(params["position_embeds_layer"],
                                         position_ids)
        mask = _extended_mask(attention_mask) if attention_mask is not None else None
        hidden = inputs_embeds + pos
        for i, block in enumerate(self._layers):
            hidden = block(params["layers"][str(i)], hidden, mask)
        hidden = self.layernorm_final(params["layernorm_final"], hidden)
        head_idx = codebook_idx - self.config.n_codes_given
        logits = self._heads[head_idx](params["lm_heads"][str(head_idx)], hidden)
        return MaskedLMOutput(logits=logits)

    def generate(self, params, coarse_output, semantic_generation_config=None,
                 coarse_generation_config=None, fine_generation_config=None,
                 codebook_size=1024, history_prompt=None):
        sgen = semantic_generation_config or BarkSemanticGenerationConfig()
        cgen = coarse_generation_config or BarkCoarseGenerationConfig()
        fgen = fine_generation_config or BarkFineGenerationConfig()
        coarse = np.asarray(coarse_output)
        batch = coarse.shape[0]
        coarse = coarse.reshape(batch, -1, cgen.n_coarse_codebooks)
        coarse = np.remainder(coarse - sgen.semantic_vocab_size, codebook_size)
        n_coarse = cgen.n_coarse_codebooks
        fine_input = np.pad(coarse,
                            ((0, 0), (0, 0), (0, fgen.n_fine_codebooks - n_coarse)),
                            constant_values=codebook_size)
        n_history = 0
        if history_prompt is not None:
            hist = np.asarray(history_prompt["fine_prompt"]).T[None]
            hist = np.repeat(hist, batch, axis=0)[:, -fgen.max_fine_history_length:]
            fine_input = np.concatenate([hist, fine_input], axis=1)
            n_history = hist.shape[1]
        n_remove = 0
        if fine_input.shape[1] < fgen.max_fine_input_length:
            n_remove = fgen.max_fine_input_length - fine_input.shape[1]
            fine_input = np.pad(fine_input, ((0, 0), (0, n_remove), (0, 0)),
                                constant_values=codebook_size)
        n_loops = (coarse.shape[1] - (fgen.max_fine_input_length - n_history)) \
            / fgen.max_fine_history_length
        n_loops = max(0, int(np.ceil(n_loops))) + 1
        for n_outer in range(n_loops):
            start = min(n_outer * fgen.max_fine_history_length,
                        fine_input.shape[1] - fgen.max_fine_input_length)
            start_fill = min(n_history + n_outer * fgen.max_fine_history_length,
                             fine_input.shape[1] - fgen.max_fine_history_length)
            rel = start_fill - start
            buf = fine_input[:, start:start + fgen.max_fine_input_length, :].copy()
            for n_inner in range(n_coarse, fgen.n_fine_codebooks):
                logits = np.asarray(self(params, codebook_idx=n_inner,
                                         input_ids=jnp.asarray(buf)).logits)
                preds = logits[:, rel:, :codebook_size].argmax(-1)
                buf[:, rel:, n_inner] = preds
            span = fgen.max_fine_input_length - rel
            for n_inner in range(n_coarse, fgen.n_fine_codebooks):
                fine_input[:, start_fill:start_fill + span, n_inner] = \
                    buf[:, rel:, n_inner]
        fine_input = fine_input.transpose(0, 2, 1)[:, :, n_history:]
        if n_remove > 0:
            fine_input = fine_input[:, :, :-n_remove]
        return jnp.asarray(fine_input)


class _EncodecCodec(Module):
    """EnCodec child under the ``codec_model`` prefix."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = build_encoder(config, **kw)
        self.decoder = build_decoder(config, **kw)
        self.quantizer = EncodecQuantizer(config, **kw)


@dataclass
class BarkGenerateOutput(ModelOutput):
    audio_waveform: Optional[jnp.ndarray] = None


class BarkModel(BarkPreTrainedModel):
    config_class = BarkConfig
    main_input_name = "input_ids"

    def __init__(self, config: BarkConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.semantic = BarkSemanticModel(config.semantic_config, **kw)
        self.coarse_acoustics = BarkCoarseModel(config.coarse_acoustics_config, **kw)
        self.fine_acoustics = BarkFineModel(config.fine_acoustics_config, **kw)
        self.codec_model = _EncodecCodec(config.codec_config, **kw)

    @property
    def tied_weights_keys(self):
        return tuple(
            (f"fine_acoustics.{a}", f"fine_acoustics.{b}")
            for a, b in self.fine_acoustics.tied_weights_keys)

    def tie_weights(self, params):
        params["fine_acoustics"] = self.fine_acoustics.tie_weights(
            params["fine_acoustics"])
        return params

    def codec_decode(self, params, fine_output, output_lengths=None):
        emb = self.codec_model.quantizer.decode(
            params["codec_model"]["quantizer"], jnp.asarray(fine_output))
        audio = self.codec_model.decoder(params["codec_model"]["decoder"], emb)
        return audio[:, 0]

    def generate(self, params, input_ids=None, history_prompt=None,
                 attention_mask=None, semantic_generation_config=None,
                 coarse_generation_config=None, fine_generation_config=None,
                 codebook_size=1024, semantic_max_new_tokens=None, **kwargs):
        semantic_output = self.semantic.generate(
            params["semantic"], jnp.asarray(input_ids),
            semantic_generation_config=semantic_generation_config,
            history_prompt=history_prompt, attention_mask=attention_mask,
            max_new_tokens=semantic_max_new_tokens)
        coarse_output = self.coarse_acoustics.generate(
            params["coarse_acoustics"], semantic_output,
            semantic_generation_config=semantic_generation_config,
            coarse_generation_config=coarse_generation_config,
            codebook_size=codebook_size, history_prompt=history_prompt)
        fine_output = self.fine_acoustics.generate(
            params["fine_acoustics"], coarse_output,
            semantic_generation_config=semantic_generation_config,
            coarse_generation_config=coarse_generation_config,
            fine_generation_config=fine_generation_config,
            codebook_size=codebook_size, history_prompt=history_prompt)
        return self.codec_decode(params, fine_output)

    def __call__(self, params, input_ids=None, **kwargs):
        return self.semantic(params["semantic"], input_ids=input_ids, **kwargs)
