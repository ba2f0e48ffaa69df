"""XLNet, TPU-native (reference src/transformers/models/xlnet/modeling_xlnet.py).

Transformer-XL-style relative attention (content + position + segment
scores, rel-shift trick) with the single content stream — the inference
path.  The reference's two-stream/query path and `mems` recurrence are
pretraining/legacy-generation machinery (perm_mask / target_mapping /
use_mems); the dense h-stream here covers all the task heads.  Everything
is batch-first (the reference permutes to time-first internally — a CPU
layout habit, not math).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_xlnet import XLNetConfig


@dataclass
class XLNetModelOutput(ModelOutput):
    last_hidden_state: Any = None
    mems: Any = None
    hidden_states: Any = None


@dataclass
class XLNetLMHeadModelOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    mems: Any = None


@dataclass
class XLNetSequenceClassifierOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    mems: Any = None


@dataclass
class XLNetQAOutput(ModelOutput):
    loss: Any = None
    start_logits: Any = None
    end_logits: Any = None
    mems: Any = None


def rel_shift_bnij(x, klen):
    """Relative-shift trick (reference XLNetRelativeAttention.rel_shift_bnij)."""
    b, n, i, j = x.shape
    x = x.reshape(b, n, j, i)
    x = x[:, :, 1:, :]
    x = x.reshape(b, n, i, j - 1)
    return x[:, :, :, :klen]


class XLNetRelativeAttention(Module):
    """Content + position + segment relative attention
    (reference XLNetRelativeAttention, h-stream)."""

    def __init__(self, config: XLNetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.n_head = config.n_head
        self.d_head = config.d_head
        self.d_model = config.d_model
        self.scale = 1.0 / (config.d_head ** 0.5)
        self.layer_norm = LayerNorm(config.d_model, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)
        self._std = config.initializer_range

    def init(self, rng):
        params = super().init(rng)
        keys = jax.random.split(rng, 9)
        shape = (self.d_model, self.n_head, self.d_head)
        for i, name in enumerate(["q", "k", "v", "o", "r"]):
            params[name] = (jax.random.normal(keys[i], shape) * self._std).astype(self.param_dtype)
        for i, name in enumerate(["r_r_bias", "r_s_bias", "r_w_bias"]):
            params[name] = jnp.zeros((self.n_head, self.d_head), self.param_dtype)
        params["seg_embed"] = (jax.random.normal(keys[8], (2, self.n_head, self.d_head))
                               * self._std).astype(self.param_dtype)
        return params

    def __call__(self, params, h, pos_emb, seg_diff, mask_h):
        """h [b, s, d]; pos_emb [L, d]; seg_diff [b, s, s] int or None;
        mask_h [b, s, s] float (1 = masked) or None."""
        p = {k: params[k].astype(self.dtype) for k in
             ("q", "k", "v", "o", "r", "r_r_bias", "r_s_bias", "r_w_bias", "seg_embed")}
        q = jnp.einsum("bih,hnd->bind", h, p["q"])
        k = jnp.einsum("bih,hnd->bind", h, p["k"])
        v = jnp.einsum("bih,hnd->bind", h, p["v"])
        k_r = jnp.einsum("lh,hnd->lnd", pos_emb.astype(self.dtype), p["r"])

        ac = jnp.einsum("bind,bjnd->bnij", q + p["r_w_bias"], k)
        bd = jnp.einsum("bind,lnd->bnil", q + p["r_r_bias"], k_r)
        bd = rel_shift_bnij(bd, klen=ac.shape[3])
        if seg_diff is not None:
            # ef[b,n,i,j] = <q_i + r_s_bias, seg_embed[seg_diff[b,i,j]]>
            ef_q = jnp.einsum("bind,snd->bins", q + p["r_s_bias"], p["seg_embed"])
            e0 = ef_q[..., 0].transpose(0, 2, 1)                  # [b,n,i]
            e1 = ef_q[..., 1].transpose(0, 2, 1)
            ef = jnp.where(seg_diff[:, None].astype(bool),
                           e1[..., None], e0[..., None])
        else:
            ef = 0.0
        score = (ac + bd + ef) * self.scale
        if mask_h is not None:
            score = score - 1e30 * mask_h[:, None]
        probs = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn_vec = jnp.einsum("bnij,bjnd->bind", probs, v)
        out = jnp.einsum("bind,hnd->bih", attn_vec, p["o"])
        return self.layer_norm(params["layer_norm"], out + h)


class XLNetFeedForward(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.layer_norm = LayerNorm(config.d_model, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)
        self.layer_1 = Linear(config.d_model, config.d_inner, True, **kw)
        self.layer_2 = Linear(config.d_inner, config.d_model, True, **kw)
        self.act = get_activation(config.ff_activation)

    def __call__(self, params, x):
        h = self.layer_2(params["layer_2"],
                         self.act(self.layer_1(params["layer_1"], x)))
        return self.layer_norm(params["layer_norm"], h + x)


class XLNetLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.rel_attn = XLNetRelativeAttention(config, **kw)
        self.ff = XLNetFeedForward(config, **kw)

    def __call__(self, params, h, pos_emb, seg_diff, mask_h):
        h = self.rel_attn(params["rel_attn"], h, pos_emb, seg_diff, mask_h)
        return self.ff(params["ff"], h)


class XLNetModel(Module):
    def __init__(self, config: XLNetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.word_embedding = Embedding(config.vocab_size, config.d_model,
                                        embedding_init=normal_init(config.initializer_range),
                                        **kw)
        self.layer = [XLNetLayer(config, **kw) for _ in range(config.n_layer)]

    def init(self, rng):
        params = super().init(rng)
        params["mask_emb"] = (jax.random.normal(rng, (1, 1, self.config.d_model))
                              * self.config.initializer_range).astype(self.param_dtype)
        return params

    def pos_encoding(self, qlen):
        """[qlen + klen, d] sinusoid over positions klen..-qlen+1 (reference
        relative_positional_encoding, attn_type='bi', no mems)."""
        d = self.config.d_model
        inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2.0) / d))
        pos_seq = np.arange(qlen, -qlen, -1.0)
        if self.config.clamp_len > 0:
            pos_seq = np.clip(pos_seq, -self.config.clamp_len, self.config.clamp_len)
        ang = pos_seq[:, None] * inv_freq[None, :]
        return jnp.asarray(np.concatenate([np.sin(ang), np.cos(ang)], axis=1),
                           jnp.float32)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> XLNetModelOutput:
        if inputs_embeds is None:
            inputs_embeds = self.word_embedding(params["word_embedding"], input_ids)
        h = inputs_embeds
        b, s, _ = h.shape
        # float "1 = masked" padding mask; a token always sees itself
        mask_h = None
        if attention_mask is not None:
            pad = 1.0 - attention_mask.astype(jnp.float32)       # [b, j]
            mask = jnp.broadcast_to(pad[:, None, :], (b, s, s))
            eye = jnp.eye(s, dtype=jnp.float32)
            mask_h = jnp.clip(mask - eye[None], 0.0, 1.0)
        seg_diff = None
        if token_type_ids is not None:
            seg_diff = (token_type_ids[:, :, None]
                        != token_type_ids[:, None, :]).astype(jnp.int32)
        pos_emb = self.pos_encoding(s)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["layer"][str(i)], h, pos_emb, seg_diff, mask_h)
        if output_hidden_states:
            all_hidden.append(h)
        return XLNetModelOutput(last_hidden_state=h,
                                hidden_states=tuple(all_hidden)
                                if all_hidden is not None else None)


class XLNetPreTrainedModel(PreTrainedModel):
    config_class = XLNetConfig
    base_model_prefix = "transformer"


class XLNetModelStandalone(XLNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = XLNetModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)


class XLNetLMHeadModel(XLNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = XLNetModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        self.lm_loss = Linear(config.d_model, config.vocab_size, True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "transformer.word_embedding.weight"

    @property
    def tied_weights_keys(self):
        if self.config.tie_word_embeddings:
            return ("lm_loss.weight",)
        return ()

    def tie_weights(self, params):
        if self.config.tie_word_embeddings:
            # torch ties [vocab, d] directly; our Linear stores [d, vocab]
            params["lm_loss"]["weight"] = \
                params["transformer"]["word_embedding"]["weight"].T
        return params

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs) -> XLNetLMHeadModelOutput:
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids, **kwargs)
        logits = self.lm_loss(params["lm_loss"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return XLNetLMHeadModelOutput(loss=loss, logits=logits)


class XLNetSequenceSummary(Module):
    """summary_type='last' + proj + tanh (reference XLNetSequenceSummary)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.summary = Linear(config.d_model, config.d_model, True, dtype=dtype,
                              param_dtype=param_dtype,
                              kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.summary_activation or "linear")

    def __call__(self, params, hidden):
        return self.act(self.summary(params["summary"], hidden[:, -1]))


class XLNetForSequenceClassification(XLNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = XLNetModel(config, **kw)
        self.sequence_summary = XLNetSequenceSummary(config, **kw)
        self.logits_proj = Linear(config.d_model, config.num_labels, True,
                                  kernel_init=normal_init(config.initializer_range),
                                  **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids)
        pooled = self.sequence_summary(params["sequence_summary"],
                                       out.last_hidden_state)
        logits = self.logits_proj(params["logits_proj"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return XLNetSequenceClassifierOutput(loss=loss, logits=logits)


class XLNetForQuestionAnsweringSimple(XLNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = XLNetModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        self.qa_outputs = Linear(config.d_model, 2, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, **kwargs):
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start, end = jnp.split(logits, 2, axis=-1)
        return XLNetQAOutput(start_logits=start[..., 0], end_logits=end[..., 0])


class XLNetForTokenClassification(XLNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = XLNetModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        self.classifier = Linear(config.d_model, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return XLNetSequenceClassifierOutput(loss=loss, logits=logits)
