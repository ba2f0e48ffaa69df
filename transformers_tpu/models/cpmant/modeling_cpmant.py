"""CPM-Ant (reference models/cpmant/modeling_cpmant.py).

Chinese PLM with learned prompt prefixes: 32 prompt tokens (ids offset past
the vocab) are prepended to every sequence and dropped from the output
(:598-662), segments (0 prompt / 2 text) add a segment embedding and select
between T5-style bucketed ABSOLUTE position bias (same-segment pairs) and a
per-(segment,segment) learned bias (:413-504). Blocks are pre-RMSNorm with
bias-free projections and a gated-GELU FFN (:162-288); lm_head is tied to
the (vocab + prompts) input embedding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.loading import WeightRule
from ...core.module import Embedding, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel


class CpmAntConfig(PretrainedConfig):
    model_type = "cpmant"

    def __init__(self, vocab_size=30720, hidden_size=4096, num_attention_heads=32,
                 dim_head=128, dim_ff=10240, num_hidden_layers=48, dropout_p=0.0,
                 position_bias_num_buckets=512, position_bias_max_distance=2048,
                 eps=1e-6, init_std=1.0, prompt_types=32, prompt_length=32,
                 segment_types=32, use_cache=True, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_attention_heads = num_attention_heads
        self.dim_head = dim_head
        self.dim_ff = dim_ff
        self.num_hidden_layers = num_hidden_layers
        self.dropout_p = dropout_p
        self.position_bias_num_buckets = position_bias_num_buckets
        self.position_bias_max_distance = position_bias_max_distance
        self.eps = eps
        self.init_std = init_std
        self.prompt_types = prompt_types
        self.prompt_length = prompt_length
        self.segment_types = segment_types
        self.use_cache = use_cache
        super().__init__(**kwargs)


class CpmAntLayerNorm(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = config.hidden_size
        self.eps = config.eps

    def init(self, rng):
        return {"weight": jnp.ones((self.dim,), self.param_dtype)}

    def __call__(self, params, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        h = (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return h * params["weight"].astype(self.dtype)


class CpmAntBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.init_std))
        d, hd = config.hidden_size, config.num_attention_heads * config.dim_head
        self.num_heads = config.num_attention_heads
        self.dim_head = config.dim_head
        sa = Module(**kw)
        sa.layernorm_before_attention = CpmAntLayerNorm(config, **kw)
        attn = Module(**kw)
        attn.project_q = Linear(d, hd, False, **lkw)
        attn.project_k = Linear(d, hd, False, **lkw)
        attn.project_v = Linear(d, hd, False, **lkw)
        attn.attention_out = Linear(hd, d, False, **lkw)
        sa.self_attention = attn
        self.self_att = sa
        ffn_block = Module(**kw)
        ffn_block.layernorm_before_ffn = CpmAntLayerNorm(config, **kw)
        ffn = Module(**kw)
        w_in = Module(**kw)
        w_in.w_0 = Linear(d, config.dim_ff, False, **lkw)
        w_in.w_1 = Linear(d, config.dim_ff, False, **lkw)
        ffn.w_in = w_in
        ffn.w_out = Linear(config.dim_ff, d, False, **lkw)
        ffn_block.ffn = ffn
        self.ffn = ffn_block

    def __call__(self, params, hidden, mask_bool, position_bias):
        sa = params["self_att"]
        b, s, _ = hidden.shape
        h = self.self_att.layernorm_before_attention(sa["layernorm_before_attention"],
                                                     hidden)
        ap = sa["self_attention"]
        attn = self.self_att.self_attention
        q = attn.project_q(ap["project_q"], h).reshape(b, s, self.num_heads, self.dim_head)
        k = attn.project_k(ap["project_k"], h).reshape(b, s, self.num_heads, self.dim_head)
        v = attn.project_v(ap["project_v"], h).reshape(b, s, self.num_heads, self.dim_head)
        score = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
        score = score + position_bias
        neg = jnp.asarray(-jnp.inf, score.dtype)
        score = jnp.where(mask_bool[:, None], score, neg)
        score = jax.nn.softmax(score, axis=-1)
        score = jnp.where(mask_bool[:, None], score, 0.0)
        out = jnp.einsum("bhqk,bkhd->bqhd", score, v).reshape(b, s, -1)
        hidden = hidden + attn.attention_out(ap["attention_out"], out)

        fp = params["ffn"]
        h = self.ffn.layernorm_before_ffn(fp["layernorm_before_ffn"], hidden)
        gate = jax.nn.gelu(self.ffn.ffn.w_in.w_0(fp["ffn"]["w_in"]["w_0"], h),
                           approximate=False)
        inner = gate * self.ffn.ffn.w_in.w_1(fp["ffn"]["w_in"]["w_1"], h)
        return hidden + self.ffn.ffn.w_out(fp["ffn"]["w_out"], inner)


def _position_bucket(rel, num_buckets, max_distance):
    num_buckets //= 2
    buckets = (rel > 0).astype(np.int32) * num_buckets
    rel = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (np.log(np.maximum(rel, 1) / max_exact)
                         / math.log(max_distance / max_exact)
                         * (num_buckets - max_exact)).astype(np.int32)
    large = np.minimum(large, num_buckets - 1)
    return buckets + np.where(is_small, rel.astype(np.int32), large)


class CpmAntModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.init_std))
        encoder = Module(**kw)
        encoder.layers = [CpmAntBlock(config, **kw)
                          for _ in range(config.num_hidden_layers)]
        encoder.output_layernorm = CpmAntLayerNorm(config, **kw)
        self.encoder = encoder
        self.segment_embedding = Embedding(config.segment_types, config.hidden_size, **ekw)
        self.input_embedding = Embedding(
            config.vocab_size + config.prompt_types * config.prompt_length,
            config.hidden_size, **ekw)
        pb = Module(**kw)
        pb.relative_attention_bias = Embedding(
            config.segment_types ** 2 + config.position_bias_num_buckets,
            config.num_attention_heads, **ekw)
        self.position_bias = pb

    def __call__(self, params, input_ids=None, output_hidden_states=False, **kwargs):
        cfg = self.config
        b, s0 = input_ids.shape
        input_ids = jnp.asarray(input_ids, jnp.int32)
        segment = jnp.where(input_ids != 0, 2, 0).astype(jnp.int32)
        length = (segment != 0).sum(-1)
        prompt_ids = jnp.arange(cfg.prompt_length * 2 + cfg.vocab_size,
                                cfg.prompt_length * 3 + cfg.vocab_size, dtype=jnp.int32)
        input_full = jnp.concatenate(
            [jnp.broadcast_to(prompt_ids[None], (b, cfg.prompt_length)), input_ids], axis=1)
        seqlen = input_full.shape[1]
        segment = jnp.concatenate(
            [jnp.zeros((b, cfg.prompt_length), jnp.int32), segment], axis=1)

        # attention mask (context all ones -> bidirectional over valid slots;
        # reference _prepare_attention_mask with context=1 everywhere)
        mask_1d_tail = (jnp.arange(seqlen - cfg.prompt_length)[::-1][None, :]
                        < length[:, None])
        mask_1d = jnp.concatenate(
            [jnp.ones((b, cfg.prompt_length), bool), mask_1d_tail], axis=1)
        attention_mask = mask_1d[:, :, None] & mask_1d[:, None, :]

        # position bias
        seg_bucket = segment[:, :, None] * cfg.segment_types + segment[:, None, :] \
            + cfg.position_bias_num_buckets
        rel = (np.arange(seqlen)[None, :] - np.arange(seqlen)[:, None])
        abs_bucket = jnp.asarray(_position_bucket(
            rel, cfg.position_bias_num_buckets, cfg.position_bias_max_distance))
        bucket = jnp.where(segment[:, None, :] == segment[:, :, None],
                           abs_bucket[None], seg_bucket)
        bias = self.position_bias.relative_attention_bias(
            params["position_bias"]["relative_attention_bias"],
            bucket).transpose(0, 3, 1, 2)  # [B,H,Q,K]

        hidden = self.input_embedding(params["input_embedding"], input_full)
        hidden = hidden + self.segment_embedding(params["segment_embedding"], segment)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["encoder"]["layers"][str(i)], hidden,
                           attention_mask, bias)
        hidden = self.encoder.output_layernorm(
            params["encoder"]["output_layernorm"], hidden)
        hidden = hidden[:, cfg.prompt_length:]
        if output_hidden_states:
            # reference drops the prompt positions from every entry (:664-666)
            all_hidden = [h[:, cfg.prompt_length:] if h.shape[1] == seqlen else h
                          for h in all_hidden]
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class CpmAntPreTrainedModel(PreTrainedModel):
    config_class = CpmAntConfig
    base_model_prefix = "cpmant"
    # the bias table is a raw nn.Parameter in the checkpoint (no .weight)
    _weight_rules = (
        WeightRule(pattern=r"^(.*position_bias\.relative_attention_bias)$",
                   rename=r"\1.weight",
                   save_pattern=r"^(.*position_bias\.relative_attention_bias)\.weight$",
                   save_rename=r"\1"),
    )


class CpmAntModelStandalone(CpmAntPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.cpmant = CpmAntModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.cpmant(params["cpmant"], *args, **kwargs)


class CpmAntForCausalLM(CpmAntPreTrainedModel, GenerationMixin):
    _keys_to_ignore_on_load_unexpected = (r"^lm_head\.weight$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.cpmant = CpmAntModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "cpmant.input_embedding.weight"

    def generate(self, params, input_ids, max_new_tokens=20, do_sample=False,
                 prng_key=None, eos_token_id=None, **kwargs):
        """Recompute-full greedy/sampling loop.

        CPM-Ant attention is fully bidirectional (context==1 everywhere,
        reference :556-562), so the incremental-decode machinery of the
        generic mixin does not apply; the model is legacy-tier and tiny, so
        we re-run the full forward per step like the reference's cacheless
        path.
        """
        import jax
        import numpy as np

        eos = eos_token_id if eos_token_id is not None else self.config.eos_token_id
        eos_ids = (tuple(eos) if isinstance(eos, (list, tuple))
                   else (eos,) if eos is not None else ())
        ids = np.asarray(input_ids, np.int32)
        finished = np.zeros(ids.shape[0], bool)
        key = prng_key if prng_key is not None else jax.random.PRNGKey(0)
        for _ in range(max_new_tokens):
            logits = np.asarray(
                self(params, input_ids=jnp.asarray(ids)).logits[:, -1, :])
            if do_sample:
                key, k = jax.random.split(key)
                tok = np.asarray(jax.random.categorical(k, jnp.asarray(logits)))
            else:
                tok = logits.argmax(-1)
            tok = tok.astype(np.int32)
            if eos_ids:
                tok = np.where(finished, eos_ids[0], tok)
                finished |= np.isin(tok, eos_ids)
            ids = np.concatenate([ids, tok[:, None]], axis=1)
            if eos_ids and finished.all():
                break
        return jnp.asarray(ids)

    def __call__(self, params, input_ids=None, labels=None, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        out = self.cpmant(params["cpmant"], input_ids,
                          output_hidden_states=output_hidden_states)
        table = params["cpmant"]["input_embedding"]["weight"]
        logits = jnp.dot(out.last_hidden_state.astype(self.dtype),
                         table.astype(self.dtype).T)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, logits.shape[-1])
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      hidden_states=out.hidden_states)
