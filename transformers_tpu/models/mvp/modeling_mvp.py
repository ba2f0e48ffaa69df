"""MVP, TPU-native (reference src/transformers/models/mvp/modeling_mvp.py).

BART layout (post-LN, learned positions offset +2, shared embeddings, tied
lm_head + final_logits_bias) plus MVP's layer-wise *prompts* for lightweight
tuning (reference modeling_mvp.py:431 MvpPrompt): per layer, ``prompt_length``
learned key/value vectors are prepended to self-attention (encoder + decoder)
and cross-attention (decoder).

TPU-native prompt decode: instead of concatenating prompt K/V every step, the
prompts are written ONCE into the first ``prompt_length`` slots of the static
KV cache at prefill, and all real-token cache positions are offset — the
decode loop then runs the unmodified static-cache kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...cache_utils import init_static_cache
from ...core.module import Embedding, Linear, Module
from ...ops.attention import get_attention_fn
from ..bart.modeling_bart import (BartAttention, BartClassificationHead,
                                  BartDecoder, BartDecoderLayer, BartEncoder,
                                  BartEncoderLayer,
                                  BartForConditionalGeneration,
                                  BartForQuestionAnswering,
                                  BartForSequenceClassification, BartModel,
                                  BartPreTrainedModel)
from .configuration_mvp import MvpConfig


class _PromptTrans(Module):
    """nn.Sequential(Linear, GELU, Linear) -> checkpoint keys ``0``/``2``
    (reference modeling_mvp.py:442)."""

    def __init__(self, d_model, mid_dim, out_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", Linear(d_model, mid_dim, True, **kw))
        setattr(self, "2", Linear(mid_dim, out_dim, True, **kw))

    def __call__(self, params, x):
        h = getattr(self, "0")(params["0"], x)
        return getattr(self, "2")(params["2"], jax.nn.gelu(h, approximate=False))


class MvpPrompt(Module):
    """Layer-wise prompt bank (reference modeling_mvp.py:431): embeds
    ``prompt_length`` ids, lifts through a 2-layer MLP, and reshapes to one
    (key, value) pair per layer. Returns [num_layers, 2, L, H, head_dim]."""

    def __init__(self, config: MvpConfig, num_layers, num_heads, *, dtype,
                 param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.prompt_length = config.prompt_length
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.head_dim = config.d_model // num_heads
        self.prompt_embedding = Embedding(config.prompt_length, config.d_model, **kw)
        self.prompt_trans = _PromptTrans(config.d_model, config.prompt_mid_dim,
                                         num_layers * 2 * config.d_model, **kw)

    def __call__(self, params):
        ids = jnp.arange(self.prompt_length, dtype=jnp.int32)
        prompt = self.prompt_trans(params["prompt_trans"],
                                   self.prompt_embedding(params["prompt_embedding"], ids))
        prompt = prompt.reshape(self.prompt_length, self.num_layers * 2,
                                self.num_heads, self.head_dim)
        prompt = prompt.transpose(1, 0, 2, 3)  # [NL*2, L, H, hd]
        return prompt.reshape(self.num_layers, 2, self.prompt_length,
                              self.num_heads, self.head_dim)


def _expand_prompt(prompt_kv, batch):
    """[2, L, H, hd] -> (k, v) each [batch, L, H, hd]."""
    k = jnp.broadcast_to(prompt_kv[0][None], (batch,) + prompt_kv[0].shape)
    v = jnp.broadcast_to(prompt_kv[1][None], (batch,) + prompt_kv[1].shape)
    return k, v


class MvpAttention(BartAttention):
    """BartAttention + optional prompt K/V prepended (reference
    modeling_mvp.py:173). With a cache the prompts already live in the first
    slots, so only the un-cached path concatenates."""

    def __call__(self, params, hidden, attn_args, kv_precomputed=None,
                 cache=None, layer_idx=0, cache_position=0, prompt_kv=None):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads,
                                                          self.head_dim)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, hidden)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
            elif prompt_kv is not None:
                pk, pv = _expand_prompt(prompt_kv, b)
                k = jnp.concatenate([pk.astype(k.dtype), k], axis=1)
                v = jnp.concatenate([pv.astype(v.dtype), v], axis=1)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class MvpEncoderLayer(BartEncoderLayer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.self_attn = MvpAttention(config.d_model,
                                      config.encoder_attention_heads, config,
                                      dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args, prompt_kv=None):
        h, _ = self.self_attn(params["self_attn"], hidden, attn_args,
                              prompt_kv=prompt_kv)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class MvpDecoderLayer(BartDecoderLayer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.self_attn = MvpAttention(config.d_model,
                                      config.decoder_attention_heads, config,
                                      dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache,
                 layer_idx, cache_position, prompt_kv=None):
        h, cache = self.self_attn(params["self_attn"], hidden, attn_args,
                                  cache=cache, layer_idx=layer_idx,
                                  cache_position=cache_position,
                                  prompt_kv=prompt_kv)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           hidden + h)
        h, _ = self.encoder_attn(params["encoder_attn"], hidden, cross_args,
                                 kv_precomputed=cross_kv)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"],
                                              hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h), cache


class MvpEncoder(BartEncoder):
    layer_cls = MvpEncoderLayer

    def __init__(self, config: MvpConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.use_prompt = config.use_prompt
        self.prompt_length = config.prompt_length
        if config.use_prompt:
            self.self_attn_prompt = MvpPrompt(config, config.encoder_layers,
                                              config.encoder_attention_heads,
                                              dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, _ = inputs_embeds.shape
        positions = self.encoder_positions(b, s, attention_mask)
        h = inputs_embeds * self.embed_scale + self.embed_positions(
            params["embed_positions"], positions)
        h = self.layernorm_embedding(params["layernorm_embedding"], h)
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        prompts = None
        if self.use_prompt:
            prompts = self.self_attn_prompt(params["self_attn_prompt"])
            kv_valid = jnp.concatenate(
                [jnp.ones((b, self.prompt_length), kv_valid.dtype), kv_valid], axis=1)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args,
                      prompt_kv=None if prompts is None else prompts[i])
        return h


class MvpDecoder(BartDecoder):
    layer_cls = MvpDecoderLayer

    def __init__(self, config: MvpConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.use_prompt = config.use_prompt
        self.prompt_length = config.prompt_length
        if config.use_prompt:
            kw = dict(dtype=dtype, param_dtype=param_dtype)
            self.self_attn_prompt = MvpPrompt(config, config.decoder_layers,
                                              config.decoder_attention_heads, **kw)
            self.cross_attn_prompt = MvpPrompt(config, config.decoder_layers,
                                               config.decoder_attention_heads, **kw)

    def __call__(self, params, inputs_embeds, cross_kv, cache=None,
                 cache_position=0, attention_mask=None, encoder_mask=None):
        b, s, _ = inputs_embeds.shape
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        pos_embeds = self.embed_positions(params["embed_positions"], positions[None, :])
        h = inputs_embeds * self.embed_scale + pos_embeds
        h = self.layernorm_embedding(params["layernorm_embedding"], h)
        L = self.prompt_length if self.use_prompt else 0
        prompts = None
        if self.use_prompt and cache is None:
            prompts = self.self_attn_prompt(params["self_attn_prompt"])
        kv_len = cache.max_len if cache is not None else s + L
        q_positions = jnp.broadcast_to(positions[None, :] + L, (b, s))
        if attention_mask is not None:
            kv_valid = attention_mask
            if L:
                kv_valid = jnp.concatenate(
                    [jnp.ones((b, L), kv_valid.dtype), kv_valid], axis=1)
        else:
            kv_valid = jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            if L:
                encoder_mask = jnp.concatenate(
                    [jnp.ones((b, L), encoder_mask.dtype), encoder_mask], axis=1)
            cross_args["kv_valid"] = encoder_mask
        layer_cache_position = cache_position + L if L else cache_position
        for i, layer in enumerate(self.layers):
            h, cache = layer(params["layers"][str(i)], h, attn_args, cross_args,
                             cross_kv[i], cache, i, layer_cache_position,
                             prompt_kv=None if prompts is None else prompts[i])
        return h, cache


class MvpModel(BartModel):
    encoder_cls = MvpEncoder
    decoder_cls = MvpDecoder


class MvpPreTrainedModel(BartPreTrainedModel):
    config_class = MvpConfig


class MvpForConditionalGeneration(MvpPreTrainedModel,
                                  BartForConditionalGeneration):
    """Reference modeling_mvp.py:1018. Cross-attention prompts are folded into
    the precomputed cross K/V; decoder self-attention prompts are written into
    the first cache slots at prefill."""

    model_cls = MvpModel

    def precompute_cross_kv(self, params, encoder_hidden):
        b = encoder_hidden.shape[0]
        use_prompt = self.config.use_prompt
        cross_prompts = None
        if use_prompt:
            cross_prompts = self.model.decoder.cross_attn_prompt(
                params["model"]["decoder"]["cross_attn_prompt"])
        out = []
        for i, layer in enumerate(self.model.decoder.layers):
            k, v = layer.encoder_attn.kv(
                params["model"]["decoder"]["layers"][str(i)]["encoder_attn"],
                encoder_hidden)
            if use_prompt:
                pk, pv = _expand_prompt(cross_prompts[i], b)
                k = jnp.concatenate([pk.astype(k.dtype), k], axis=1)
                v = jnp.concatenate([pv.astype(v.dtype), v], axis=1)
            out.append((k, v))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        if (self.config.use_prompt and cache is not None
                and isinstance(cache_position, int) and cache_position == 0):
            prompts = self.model.decoder.self_attn_prompt(
                params["model"]["decoder"]["self_attn_prompt"])
            b = input_ids.shape[0]
            for i in range(self.config.decoder_layers):
                pk, pv = _expand_prompt(prompts[i], b)
                cache = cache.update(i, pk, pv, 0)
        embeds = self.model.shared(params["model"]["shared"], input_ids)
        return self.model.decoder(params["model"]["decoder"], embeds, cross_kv,
                                  cache, cache_position, decoder_mask,
                                  encoder_mask)

    def init_decoder_cache(self, batch_size, max_len, dtype=None):
        c = self.config
        if c.use_prompt:
            max_len = max_len + c.prompt_length
        return init_static_cache(num_layers=c.decoder_layers,
                                 batch_size=batch_size, max_len=max_len,
                                 num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)


class MvpForSequenceClassification(MvpPreTrainedModel,
                                   BartForSequenceClassification):
    model_cls = MvpModel

    def run(self, params, model, config, input_ids, attention_mask,
            decoder_input_ids, decoder_attention_mask):
        from ..bart.modeling_bart import shift_tokens_right

        if decoder_input_ids is None:
            decoder_input_ids = shift_tokens_right(
                input_ids, config.pad_token_id, config.decoder_start_token_id)
        embeds = model.shared(params["model"]["shared"], input_ids)
        enc = model.encoder(params["model"]["encoder"], embeds, attention_mask)
        helper = MvpForConditionalGeneration.precompute_cross_kv
        cross_kv = helper(self, params, enc)
        dec_embeds = model.shared(params["model"]["shared"], decoder_input_ids)
        hidden, _ = model.decoder(params["model"]["decoder"], dec_embeds,
                                  cross_kv, None, 0, decoder_attention_mask,
                                  attention_mask)
        return hidden


class MvpForQuestionAnswering(MvpPreTrainedModel, BartForQuestionAnswering):
    model_cls = MvpModel
    run = MvpForSequenceClassification.run
