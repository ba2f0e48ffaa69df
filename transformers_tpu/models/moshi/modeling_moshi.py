"""Moshi — full-duplex speech-text foundation model (reference
models/moshi/modeling_moshi.py).

- Temporal transformer (:1197 MoshiModel): llama-style decoder whose
  projections are wrapped one level deeper (``q_proj.linear.weight``) and
  whose MLP is the chunked gating variant (:345: fc1 -> reshape [..., 2, F/2]
  -> act(gate)·up -> fc2), vocab_size+1 embedding rows, sliding-window
  attention.
- Depth transformer (:832 MoshiDepthDecoder): per-codebook **flexible
  linears** (:215 — one weight per sequence position selected by
  cache_position), rope-free, summing text + per-codebook audio embeddings
  with a projection of the temporal transformer's last hidden state.
- MoshiForConditionalGeneration (:1584): 2·num_codebooks audio embedding
  tables (moshi stream then user stream) summed into the text embedding, a
  Mimi codec as audio tokenizer, and the depth decoder for intra-step
  codebook generation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import (BaseModelOutputWithPast,
                                 CausalLMOutputWithPast, ModelOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ..llama.modeling_llama import (LlamaAttention, LlamaDecoderLayer,
                                    LlamaForCausalLM, LlamaModel,
                                    LlamaModelStandalone)
from ..mimi.modeling_mimi import MimiModel
from .configuration_moshi import MoshiConfig, MoshiDepthConfig


class _WrappedLinear(Module):
    """MoshiLinear's non-flexible branch: one extra ``linear`` level (:254)."""

    def __init__(self, in_features, out_features, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.linear = Linear(in_features, out_features, False, dtype=dtype,
                             param_dtype=param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.linear(params["linear"], x)


class MoshiFlexibleLinear(Module):
    """One weight matrix per codebook position (:215): weight [L, out, in];
    position i of the sequence uses weight[layer_idx[i]]."""

    def __init__(self, input_size, output_size, num_layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = (num_layers, output_size, input_size)

    def init(self, rng):
        return {"weight": jax.random.normal(rng, self.shape).astype(self.param_dtype)}

    def __call__(self, params, x, layer_idx=None):
        w = params["weight"].astype(self.dtype)  # [L, O, I]
        if layer_idx is not None:
            w = jnp.take(w, layer_idx, axis=0)  # [S, O, I]
        return jnp.einsum("bsi,soi->bso", x.astype(self.dtype), w)


class MoshiGatingMLP(Module):
    """fc1 -> [..., 2, F/2] chunked gate (:345) -> fc2."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.fc1 = Linear(config.hidden_size, config.ffn_dim, False, **kw)
        self.fc2 = Linear(config.ffn_dim // 2, config.hidden_size, False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        h = self.fc1(params["fc1"], x)
        b, s, _ = h.shape
        h = h.reshape(b, s, 2, -1)
        h = self.act(h[..., 0, :]) * h[..., 1, :]
        return self.fc2(params["fc2"], h)


class MoshiAttention(LlamaAttention):
    def build_projections(self, config, qkv_bias, o_bias, kw):
        kw2 = dict(dtype=kw["dtype"], param_dtype=kw["param_dtype"])
        h = config.hidden_size
        self.q_proj = _WrappedLinear(h, self.num_heads * self.head_dim, **kw2)
        self.k_proj = _WrappedLinear(h, self.num_kv_heads * self.head_dim, **kw2)
        self.v_proj = _WrappedLinear(h, self.num_kv_heads * self.head_dim, **kw2)
        self.o_proj = _WrappedLinear(self.num_heads * self.head_dim, h, **kw2)


class MoshiDecoderLayer(LlamaDecoderLayer):
    attention_cls = MoshiAttention
    mlp_cls = MoshiGatingMLP


class MoshiModel(LlamaModel):
    decoder_layer_cls = MoshiDecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # vocab_size + 1 rows (the extra row is the audio-padding text token)
        del self._children["embed_tokens"]
        object.__delattr__(self, "embed_tokens")
        self.embed_tokens = Embedding(
            config.vocab_size + 1, config.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype,
            embedding_init=normal_init(config.initializer_range))


class MoshiPreTrainedModel(PreTrainedModel):
    config_class = MoshiConfig
    base_model_prefix = "model"


class MoshiForCausalLM(LlamaForCausalLM):
    config_class = MoshiConfig
    model_cls = MoshiModel


class MoshiModelStandalone(LlamaModelStandalone):
    config_class = MoshiConfig
    model_cls = MoshiModel


# ------------------------------------------------------------ depth decoder
class MoshiDepthAttention(Module):
    """Flexible-linear attention, rope-free (:383 with use_flexible_linear)."""

    def __init__(self, config: MoshiDepthConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_key_value_heads
        self.head_dim = config.head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        n = config.num_codebooks

        def flex(i, o):
            m = Module(dtype=dtype, param_dtype=param_dtype)
            m.linear = MoshiFlexibleLinear(i, o, n, **kw)
            return m

        self.q_proj = flex(h, self.num_heads * self.head_dim)
        self.k_proj = flex(h, self.num_kv_heads * self.head_dim)
        self.v_proj = flex(h, self.num_kv_heads * self.head_dim)
        self.o_proj = flex(self.num_heads * self.head_dim, h)

    def __call__(self, params, hidden, positions):
        b, s, _ = hidden.shape
        q = self.q_proj.linear(params["q_proj"]["linear"], hidden, positions)
        k = self.k_proj.linear(params["k_proj"]["linear"], hidden, positions)
        v = self.v_proj.linear(params["v_proj"]["linear"], hidden, positions)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_kv_heads, self.head_dim)
        v = v.reshape(b, s, self.num_kv_heads, self.head_dim)
        out = eager_attention(q, k, v, is_causal=True,
                              q_positions=jnp.broadcast_to(positions[None], (b, s)),
                              kv_valid=jnp.ones((b, s), jnp.int32),
                              scale=self.head_dim**-0.5)
        return self.o_proj.linear(params["o_proj"]["linear"],
                                  out.reshape(b, s, -1), positions)


class MoshiDepthMLP(Module):
    def __init__(self, config: MoshiDepthConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        n = config.num_codebooks
        self.fc1 = MoshiFlexibleLinear(config.hidden_size, config.ffn_dim, n, **kw)
        self.fc2 = MoshiFlexibleLinear(config.ffn_dim // 2, config.hidden_size, n, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x, positions):
        h = self.fc1(params["fc1"], x, positions)
        b, s, _ = h.shape
        h = h.reshape(b, s, 2, -1)
        h = self.act(h[..., 0, :]) * h[..., 1, :]
        return self.fc2(params["fc2"], h, positions)


class MoshiDepthLayer(Module):
    def __init__(self, config: MoshiDepthConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = MoshiDepthAttention(config, **kw)
        self.mlp = MoshiDepthMLP(config, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, positions):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h = self.self_attn(params["self_attn"], h, positions)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h, positions)
        return residual + h


class MoshiDepthDecoder(PreTrainedModel):
    """reference :832 — generates the codebook stack for ONE temporal step."""

    config_class = MoshiDepthConfig
    base_model_prefix = "model"

    def __init__(self, config: MoshiDepthConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ekw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   embedding_init=normal_init(config.initializer_range))
        self.text_embed_tokens = Embedding(config.vocab_size + 1, config.hidden_size, **ekw)
        self.embed_tokens = [Embedding(config.audio_vocab_size + 1, config.hidden_size, **ekw)
                             for _ in range(config.num_codebooks - 1)]
        self.input_projections = MoshiFlexibleLinear(
            config.input_size, config.hidden_size, config.num_codebooks, **kw)
        self.layers = [MoshiDepthLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.lm_heads = MoshiFlexibleLinear(
            config.hidden_size, config.audio_vocab_size, config.num_codebooks, **kw)

    def __call__(self, params, input_ids=None, last_hidden_state=None,
                 inputs_embeds=None, cache_position=None,
                 **kwargs) -> CausalLMOutputWithPast:
        """input_ids [B, S≤num_codebooks]: text token then audio codes;
        last_hidden_state [B, S, input_size] from the temporal transformer."""
        if cache_position is None:
            s = input_ids.shape[1] if input_ids is not None else inputs_embeds.shape[1]
            cache_position = jnp.arange(s, dtype=jnp.int32)
        if inputs_embeds is None:
            b, s = input_ids.shape
            parts = []
            for i in range(s):
                pos = int(cache_position[i]) if cache_position.ndim else int(cache_position)
                if pos == 0:
                    parts.append(self.text_embed_tokens(
                        params["text_embed_tokens"], input_ids[:, i:i + 1]))
                else:
                    parts.append(self.embed_tokens[pos - 1](
                        params["embed_tokens"][str(pos - 1)], input_ids[:, i:i + 1]))
            inputs_embeds = jnp.concatenate(parts, axis=1)
        inputs_embeds = inputs_embeds + self.input_projections(
            params["input_projections"], last_hidden_state, cache_position)
        hidden = inputs_embeds
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, cache_position)
        logits = self.lm_heads(params["lm_heads"], hidden, cache_position)
        return CausalLMOutputWithPast(logits=logits)


class MoshiForConditionalGeneration(MoshiPreTrainedModel, GenerationMixin):
    """reference :1584 — temporal decoder + depth decoder + Mimi codec."""

    main_input_name = "input_ids"

    def __init__(self, config: MoshiConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ekw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   embedding_init=normal_init(config.initializer_range))
        self.embed_tokens = [Embedding(config.audio_vocab_size + 1, config.hidden_size, **ekw)
                             for _ in range(2 * config.num_codebooks)]
        self.audio_encoder = MimiModel(config.audio_encoder_config, **kw)
        self.decoder = MoshiForCausalLM(config, **kw)
        self.depth_decoder = MoshiDepthDecoder(config.depth_decoder_config, **kw)
        self.num_codebooks = config.num_codebooks

    def get_input_embedding_path(self):
        return "decoder.model.embed_tokens.weight"

    def build_inputs_embeds(self, params, input_ids, moshi_audio_codes=None,
                            user_audio_codes=None):
        embeds = None
        if input_ids is not None:
            embeds = self.decoder.model.embed_tokens(
                params["decoder"]["model"]["embed_tokens"], input_ids)
        codes = []
        if moshi_audio_codes is not None:
            codes.append(moshi_audio_codes)
        if user_audio_codes is not None:
            codes.append(user_audio_codes)
        if codes:
            audio_codes = jnp.concatenate(codes, axis=1)  # [B, K, S]
            audio = sum(self.embed_tokens[cb](params["embed_tokens"][str(cb)],
                                              audio_codes[:, cb])
                        for cb in range(audio_codes.shape[1]))
            embeds = audio if embeds is None else embeds + audio
        return embeds

    def __call__(self, params, input_ids=None, attention_mask=None,
                 user_input_values=None, user_audio_codes=None,
                 moshi_input_values=None, moshi_audio_codes=None,
                 past_key_values=None, inputs_embeds=None, cache_position=0,
                 position_ids=None, **kwargs):
        if inputs_embeds is None:
            if user_input_values is not None and user_audio_codes is None:
                user_audio_codes = self.audio_encoder.encode(
                    params["audio_encoder"], user_input_values,
                    num_quantizers=self.num_codebooks)
            if moshi_input_values is not None and moshi_audio_codes is None:
                moshi_audio_codes = self.audio_encoder.encode(
                    params["audio_encoder"], moshi_input_values,
                    num_quantizers=self.num_codebooks)
            inputs_embeds = self.build_inputs_embeds(params, input_ids,
                                                     moshi_audio_codes,
                                                     user_audio_codes)
        return self.decoder(params["decoder"], None, attention_mask, position_ids,
                            past_key_values, cache_position, inputs_embeds, **kwargs)

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        return self.decoder.init_cache(batch_size, max_len, dtype, implementation)
