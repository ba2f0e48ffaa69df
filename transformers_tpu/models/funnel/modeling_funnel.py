"""Funnel Transformer, TPU-native (reference src/transformers/models/funnel/modeling_funnel.py).

Encoder blocks progressively mean-pool the sequence 2x (queries only by
default, `pool_q_only`), with Transformer-XL style relative-position
attention (`relative_shift`) or the factorized variant, plus token-type
attention with a learned 2-way segment embedding. A small decoder upsamples
the last block back to full length and adds the block-1 residual
(reference FunnelDecoder, modeling_funnel.py:604).

TPU framing: every pooling/stride decision depends only on STATIC sequence
lengths, so the whole funnel schedule (positions, relative-shift gathers,
cls masks) is precomputed in trace-time numpy; the device graph is pure
einsum/softmax — no dynamic shapes, no host sync.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutput, MaskedLMOutput,
                                 QuestionAnsweringModelOutput,
                                 SequenceClassifierOutput,
                                 TokenClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_funnel import FunnelConfig

INF = 1e6


class FunnelEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(1.0))
        self.word_embeddings = Embedding(config.vocab_size, config.d_model, **kw)
        self.layer_norm = LayerNorm(config.d_model, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids):
        h = self.word_embeddings(params["word_embeddings"], input_ids)
        return self.layer_norm(params["layer_norm"], h)


def _stride_pool_pos(pos, block_index, separate_cls, truncate_seq):
    """numpy version of reference stride_pool_pos (modeling_funnel.py:185)."""
    if separate_cls:
        cls_pos = np.array([-(2 ** block_index) + 1], dtype=np.int64)
        pooled = pos[1:-1] if truncate_seq else pos[1:]
        return np.concatenate([cls_pos, pooled[::2]])
    return pos[::2]


def _relative_pos(pos, stride, pooled_pos=None, shift=1):
    if pooled_pos is None:
        pooled_pos = pos
    ref_point = pooled_pos[0] - pos[0]
    num_remove = shift * pooled_pos.shape[0]
    max_dist = ref_point + num_remove * stride
    min_dist = pooled_pos[0] - pos[-1]
    return np.arange(max_dist, min_dist - 1, -stride, dtype=np.int64)


def _position_embeds(seq_len, config):
    """Trace-time tables for both attention types (reference
    get_position_embeds, modeling_funnel.py:105)."""
    d_model = config.d_model
    inv_freq = 1.0 / (10000 ** (np.arange(0, d_model // 2, dtype=np.float64)
                                / (d_model // 2)))
    if config.attention_type == "factorized":
        pos_seq = np.arange(seq_len, dtype=np.float64)
        sinusoid = pos_seq[:, None] * inv_freq[None]
        sin_e, cos_e = np.sin(sinusoid), np.cos(sinusoid)
        phi = np.concatenate([sin_e, sin_e], axis=-1)
        psi = np.concatenate([cos_e, sin_e], axis=-1)
        pi = np.concatenate([cos_e, cos_e], axis=-1)
        omega = np.concatenate([-sin_e, cos_e], axis=-1)
        return [jnp.asarray(x, jnp.float32) for x in (phi, pi, psi, omega)]
    rel_pos_id = np.arange(-seq_len * 2, seq_len * 2, dtype=np.float64)
    zero_offset = seq_len * 2
    sinusoid = rel_pos_id[:, None] * inv_freq[None]
    pos_embed = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    pos = np.arange(seq_len, dtype=np.int64)
    pooled_pos = pos
    out = []
    for block_index in range(config.num_blocks):
        if block_index == 0:
            pooling = None
        else:
            pooled_pos = _stride_pool_pos(pos, block_index, config.separate_cls,
                                          config.truncate_seq)
            stride = 2 ** (block_index - 1)
            rel = _relative_pos(pos, stride, pooled_pos, shift=2)
            pooling = jnp.asarray(pos_embed[rel + zero_offset], jnp.float32)
        pos = pooled_pos
        stride = 2 ** block_index
        rel = _relative_pos(pos, stride)
        nopool = jnp.asarray(pos_embed[rel + zero_offset], jnp.float32)
        out.append((nopool, pooling))
    return out


def _stride_pool(tensor, axis, separate_cls, truncate_seq):
    """Reference stride_pool (modeling_funnel.py:214)."""
    if tensor is None:
        return None
    if isinstance(axis, (list, tuple)):
        for ax in axis:
            tensor = _stride_pool(tensor, ax, separate_cls, truncate_seq)
        return tensor
    if isinstance(tensor, (list, tuple)):
        return type(tensor)(_stride_pool(t, axis, separate_cls, truncate_seq)
                            for t in tensor)
    axis %= tensor.ndim
    sl = slice(None, -1, 2) if separate_cls and truncate_seq else slice(None, None, 2)
    if separate_cls:
        cls_slice = tuple([slice(None)] * axis + [slice(None, 1)])
        tensor = jnp.concatenate([tensor[cls_slice], tensor], axis=axis)
    enc_slice = tuple([slice(None)] * axis + [sl])
    return tensor[enc_slice]


def _pool_tensor(tensor, separate_cls, truncate_seq, mode="mean", stride=2):
    """Reference pool_tensor (modeling_funnel.py:247): ceil-mode 1D pooling."""
    if tensor is None:
        return None
    if separate_cls:
        suffix = tensor[:, :-1] if truncate_seq else tensor
        tensor = jnp.concatenate([tensor[:, :1], suffix], axis=1)
    ndim = tensor.ndim
    h = tensor if ndim == 3 else tensor[..., None]
    s = h.shape[1]
    pad = (-s) % stride
    if mode == "mean":
        hp = jnp.pad(h.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
        cnt = jnp.pad(jnp.ones((1, s, 1), jnp.float32), ((0, 0), (0, pad), (0, 0)))
        hp = hp.reshape(h.shape[0], -1, stride, h.shape[-1]).sum(axis=2)
        cnt = cnt.reshape(1, -1, stride, 1).sum(axis=2)
        out = (hp / cnt).astype(tensor.dtype)
    else:
        neg = jnp.finfo(jnp.float32).min
        hp = jnp.pad(h.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)),
                     constant_values=neg if mode == "max" else -neg)
        hp = hp.reshape(h.shape[0], -1, stride, h.shape[-1])
        out = (hp.max(axis=2) if mode == "max" else hp.min(axis=2)).astype(tensor.dtype)
    return out if ndim == 3 else out[..., 0]


class FunnelRelMultiheadAttention(Module):
    """Reference modeling_funnel.py:337."""

    def __init__(self, config: FunnelConfig, block_index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d, n, h = config.d_model, config.n_head, config.d_head
        self.config = config
        self.block_index = block_index
        self.n_head, self.d_head = n, h
        self.scale = 1.0 / (h ** 0.5)
        self.q_head = Linear(d, n * h, False, **kw)
        self.k_head = Linear(d, n * h, True, **kw)
        self.v_head = Linear(d, n * h, True, **kw)
        self.post_proj = Linear(n * h, d, True, **kw)
        self.layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        n, h, d = self.n_head, self.d_head, self.config.d_model
        params["r_w_bias"] = jnp.zeros((n, h), self.param_dtype)
        params["r_r_bias"] = jnp.zeros((n, h), self.param_dtype)
        params["r_kernel"] = jnp.zeros((d, n, h), self.param_dtype)
        params["r_s_bias"] = jnp.zeros((n, h), self.param_dtype)
        params["seg_embed"] = jnp.zeros((2, n, h), self.param_dtype)
        return params

    def _positional_attn(self, params, position_embeds, q_head, context_len,
                         cls_mask):
        if self.config.attention_type == "factorized":
            phi, pi, psi, omega = position_embeds
            u = params["r_r_bias"].astype(q_head.dtype) * self.scale
            w_r = params["r_kernel"].astype(q_head.dtype)
            q_r = jnp.einsum("binh,dnh->bind", q_head + u, w_r)
            attn = (jnp.einsum("bind,jd->bnij", q_r * phi[:, None], psi)
                    + jnp.einsum("bind,jd->bnij", q_r * pi[:, None], omega))
        else:
            shift = 2 if q_head.shape[1] != context_len else 1
            r = position_embeds[self.block_index][shift - 1]
            v = params["r_r_bias"].astype(q_head.dtype) * self.scale
            w_r = params["r_kernel"].astype(q_head.dtype)
            r_head = jnp.einsum("td,dnh->tnh", r.astype(q_head.dtype), w_r)
            attn = jnp.einsum("binh,tnh->bnit", q_head + v, r_head)
            # relative-shift gather (reference _relative_shift_gather)
            b, n, s, mrl = attn.shape
            attn = attn.reshape(b, n, mrl, s)[:, :, shift:]
            attn = attn.reshape(b, n, s, mrl - shift)[..., :context_len]
        if cls_mask is not None:
            attn = attn * cls_mask
        return attn

    def _token_type_attn(self, params, token_type_mat, q_head, cls_mask):
        if token_type_mat is None:
            return 0.0
        r_s = params["r_s_bias"].astype(q_head.dtype) * self.scale
        bias = jnp.einsum("bind,snd->bnis", q_head + r_s,
                          params["seg_embed"].astype(q_head.dtype))
        diff, same = bias[..., 0:1], bias[..., 1:2]
        # where() broadcasts (b,1,i,j) mask against (b,n,i,1) biases -> (b,n,i,j)
        attn = jnp.where(token_type_mat[:, None], same, diff)
        if cls_mask is not None:
            attn = attn * cls_mask
        return attn

    def __call__(self, params, query, key, value, attention_inputs):
        position_embeds, token_type_mat, attention_mask, cls_mask = attention_inputs
        b, s, _ = query.shape
        context_len = key.shape[1]
        n, h = self.n_head, self.d_head
        q_head = self.q_head(params["q_head"], query).reshape(b, s, n, h) * self.scale
        k_head = self.k_head(params["k_head"], key).reshape(b, context_len, n, h)
        v_head = self.v_head(params["v_head"], value).reshape(b, context_len, n, h)
        r_w = params["r_w_bias"].astype(q_head.dtype) * self.scale
        content = jnp.einsum("bind,bjnd->bnij", q_head + r_w, k_head)
        score = (content
                 + self._positional_attn(params, position_embeds, q_head,
                                         context_len, cls_mask)
                 + self._token_type_attn(params, token_type_mat, q_head, cls_mask))
        score = score.astype(jnp.float32)
        if attention_mask is not None:
            score = score - INF * (1.0 - attention_mask[:, None, None].astype(jnp.float32))
        prob = jax.nn.softmax(score, axis=-1).astype(query.dtype)
        vec = jnp.einsum("bnij,bjnd->bind", prob, v_head)
        out = self.post_proj(params["post_proj"], vec.reshape(b, s, n * h))
        return self.layer_norm(params["layer_norm"], query + out)


class FunnelPositionwiseFFN(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.linear_1 = Linear(config.d_model, config.d_inner, True, **kw)
        self.linear_2 = Linear(config.d_inner, config.d_model, True, **kw)
        self.layer_norm = LayerNorm(config.d_model, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        h = self.linear_2(params["linear_2"],
                          self.act(self.linear_1(params["linear_1"], hidden)))
        return self.layer_norm(params["layer_norm"], hidden + h)


class FunnelLayer(Module):
    def __init__(self, config, block_index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = FunnelRelMultiheadAttention(config, block_index, **kw)
        self.ffn = FunnelPositionwiseFFN(config, **kw)

    def __call__(self, params, query, key, value, attention_inputs):
        h = self.attention(params["attention"], query, key, value,
                           attention_inputs)
        return self.ffn(params["ffn"], h)


class _Block(Module):
    """Registers layers under bare numeric names so checkpoint paths are
    ``blocks.N.M....`` (torch nested ModuleList)."""

    def __init__(self, layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = layers
        self._children.pop("layers", None)
        for i, m in enumerate(layers):
            self._children[str(i)] = m


class FunnelEncoder(Module):
    """Reference modeling_funnel.py:519."""

    def __init__(self, config: FunnelConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        blocks = []
        for bi, bs in enumerate(config.block_sizes):
            blocks.append(_Block([FunnelLayer(config, bi, **kw)
                                  for _ in range(bs)], **kw))
        self.blocks = blocks

    def _token_type_mat(self, token_type_ids):
        same = token_type_ids[:, :, None] == token_type_ids[:, None]
        cls_ids = token_type_ids == 2
        cls_mat = cls_ids[:, :, None] | cls_ids[:, None]
        return cls_mat | same

    def __call__(self, params, inputs_embeds, attention_mask=None,
                 token_type_ids=None, return_block1=False):
        c = self.config
        b, s, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        attention_mask = attention_mask.astype(inputs_embeds.dtype)
        position_embeds = _position_embeds(s, c)
        token_type_mat = (self._token_type_mat(token_type_ids)
                          if token_type_ids is not None else None)
        cls_mask = None
        if c.separate_cls:
            cls_mask = jnp.pad(jnp.ones((s - 1, s - 1), inputs_embeds.dtype),
                               ((1, 0), (1, 0)))
        attention_inputs = (position_embeds, token_type_mat, attention_mask, cls_mask)
        hidden = inputs_embeds
        block1_hidden = None
        for block_index, block in enumerate(self.blocks):
            pooling_flag = hidden.shape[1] > (2 if c.separate_cls else 1)
            pooling_flag = pooling_flag and block_index > 0
            pooled_hidden = None
            if pooling_flag:
                pooled_hidden, attention_inputs = self._pre_pool(hidden, attention_inputs)
            for layer_index, layer in enumerate(block.layers):
                for repeat_index in range(c.block_repeats[block_index]):
                    do_pooling = (repeat_index == 0 and layer_index == 0
                                  and pooling_flag)
                    if do_pooling:
                        query = pooled_hidden
                        key = value = hidden if c.pool_q_only else pooled_hidden
                    else:
                        query = key = value = hidden
                    hidden = layer(params["blocks"][str(block_index)][str(layer_index)],
                                   query, key, value, attention_inputs)
                    if do_pooling:
                        attention_inputs = self._post_pool(attention_inputs)
            if block_index == 0:
                block1_hidden = hidden
        if return_block1:
            return hidden, block1_hidden
        return hidden

    def _pre_pool(self, output, attention_inputs):
        c = self.config
        position_embeds, token_type_mat, attention_mask, cls_mask = attention_inputs
        sp = lambda t, ax: _stride_pool(t, ax, c.separate_cls, c.truncate_seq)
        pt = lambda t, mode: _pool_tensor(t, c.separate_cls, c.truncate_seq, mode)
        if c.pool_q_only:
            if c.attention_type == "factorized":
                position_embeds = sp(position_embeds[:2], 0) + position_embeds[2:]
            token_type_mat = sp(token_type_mat, 1)
            cls_mask = sp(cls_mask, 0)
            output = pt(output, c.pooling_type)
        else:
            if c.attention_type == "factorized":
                position_embeds = sp(position_embeds, 0)
            token_type_mat = sp(token_type_mat, [1, 2])
            cls_mask = sp(cls_mask, [0, 1])
            attention_mask = pt(attention_mask, "min")
            output = pt(output, c.pooling_type)
        return output, (position_embeds, token_type_mat, attention_mask, cls_mask)

    def _post_pool(self, attention_inputs):
        c = self.config
        position_embeds, token_type_mat, attention_mask, cls_mask = attention_inputs
        if c.pool_q_only:
            sp = lambda t, ax: _stride_pool(t, ax, c.separate_cls, c.truncate_seq)
            if c.attention_type == "factorized":
                position_embeds = position_embeds[:2] + sp(position_embeds[2:], 0)
            token_type_mat = sp(token_type_mat, 2)
            cls_mask = sp(cls_mask, 1)
            attention_mask = _pool_tensor(attention_mask, c.separate_cls,
                                          c.truncate_seq, "min")
        return (position_embeds, token_type_mat, attention_mask, cls_mask)


def _upsample(x, stride, target_len, separate_cls, truncate_seq):
    """Reference upsample (modeling_funnel.py:582)."""
    if stride == 1:
        return x
    if separate_cls:
        cls = x[:, :1]
        x = x[:, 1:]
    out = jnp.repeat(x, stride, axis=1)
    if separate_cls:
        if truncate_seq:
            out = jnp.pad(out, ((0, 0), (0, stride - 1), (0, 0)))
        out = out[:, : target_len - 1]
        out = jnp.concatenate([cls, out], axis=1)
    else:
        out = out[:, :target_len]
    return out


class FunnelDecoder(Module):
    def __init__(self, config: FunnelConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layers = [FunnelLayer(config, 0, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_decoder_layers)]

    def __call__(self, params, final_hidden, first_block_hidden,
                 attention_mask=None, token_type_ids=None):
        c = self.config
        up = _upsample(final_hidden, 2 ** (len(c.block_sizes) - 1),
                       first_block_hidden.shape[1], c.separate_cls, c.truncate_seq)
        hidden = up + first_block_hidden
        b, s, _ = hidden.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        attention_mask = attention_mask.astype(hidden.dtype)
        position_embeds = _position_embeds(s, c)
        token_type_mat = None
        if token_type_ids is not None:
            same = token_type_ids[:, :, None] == token_type_ids[:, None]
            cls_ids = token_type_ids == 2
            token_type_mat = (cls_ids[:, :, None] | cls_ids[:, None]) | same
        cls_mask = None
        if c.separate_cls:
            cls_mask = jnp.pad(jnp.ones((s - 1, s - 1), hidden.dtype), ((1, 0), (1, 0)))
        attention_inputs = (position_embeds, token_type_mat, attention_mask, cls_mask)
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, hidden, hidden,
                           attention_inputs)
        return hidden


class FunnelPreTrainedModel(PreTrainedModel):
    config_class = FunnelConfig
    base_model_prefix = "funnel"
    _keys_to_ignore_on_load_unexpected = (r"^lm_head\.weight$",)


class FunnelBaseModel(FunnelPreTrainedModel):
    """Encoder-only tower (reference modeling_funnel.py:741)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = FunnelEmbeddings(config, **kw)
        self.encoder = FunnelEncoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, **kwargs):
        if token_type_ids is None:  # reference defaults to zeros (modeling_funnel.py:771)
            token_type_ids = jnp.zeros_like(input_ids)
        h = self.embeddings(params["embeddings"], input_ids)
        hidden = self.encoder(params["encoder"], h, attention_mask,
                              token_type_ids)
        return BaseModelOutput(last_hidden_state=hidden)


class FunnelModel(FunnelPreTrainedModel):
    """Encoder + upsampling decoder (reference modeling_funnel.py:808)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = FunnelEmbeddings(config, **kw)
        self.encoder = FunnelEncoder(config, **kw)
        self.decoder = FunnelDecoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, **kwargs):
        if token_type_ids is None:  # reference defaults to zeros (modeling_funnel.py:771)
            token_type_ids = jnp.zeros_like(input_ids)
        h = self.embeddings(params["embeddings"], input_ids)
        final, block1 = self.encoder(params["encoder"], h, attention_mask,
                                     token_type_ids, return_block1=True)
        hidden = self.decoder(params["decoder"], final, block1,
                              attention_mask, token_type_ids)
        return BaseModelOutput(last_hidden_state=hidden)


class FunnelForMaskedLM(FunnelPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.funnel = FunnelModel(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        # lm_head.weight is tied to the embedding table; only the bias is real
        params["lm_head"] = {"bias": jnp.zeros((self.vocab_size,), self.param_dtype)}
        return params

    def get_input_embedding_path(self):
        return "funnel.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.funnel(params["funnel"], input_ids, attention_mask,
                          token_type_ids)
        table = params["funnel"]["embeddings"]["word_embeddings"]["weight"]
        logits = jnp.dot(out.last_hidden_state, table.astype(out.last_hidden_state.dtype).T)
        logits = logits + params["lm_head"]["bias"].astype(logits.dtype)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class FunnelClassificationHead(Module):
    def __init__(self, config, n_labels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.linear_hidden = Linear(config.d_model, config.d_model, True, **kw)
        self.linear_out = Linear(config.d_model, n_labels, True, **kw)

    def __call__(self, params, hidden):
        h = jnp.tanh(self.linear_hidden(params["linear_hidden"], hidden))
        return self.linear_out(params["linear_out"], h)


class FunnelForSequenceClassification(FunnelPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.funnel = FunnelBaseModel(config, **kw)
        self.classifier = FunnelClassificationHead(config, config.num_labels, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.funnel(params["funnel"], input_ids, attention_mask,
                          token_type_ids)
        logits = self.classifier(params["classifier"],
                                 out.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class FunnelForMultipleChoice(FunnelPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.funnel = FunnelBaseModel(config, **kw)
        self.classifier = FunnelClassificationHead(config, 1, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        b, n, s = input_ids.shape
        flat = lambda x: None if x is None else x.reshape(-1, s)
        out = self.funnel(params["funnel"], flat(input_ids),
                          flat(attention_mask), flat(token_type_ids))
        logits = self.classifier(params["classifier"],
                                 out.last_hidden_state[:, 0]).reshape(b, n)
        loss = None
        if labels is not None:
            from ...loss import cross_entropy

            loss = cross_entropy(logits, labels)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class FunnelForTokenClassification(FunnelPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.funnel = FunnelModel(config, **kw)
        self.classifier = Linear(config.d_model, config.num_labels, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.funnel(params["funnel"], input_ids, attention_mask,
                          token_type_ids)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits)


class FunnelForQuestionAnswering(FunnelPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.funnel = FunnelModel(config, **kw)
        self.qa_outputs = Linear(config.d_model, 2, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, start_positions=None, end_positions=None,
                 **kwargs):
        out = self.funnel(params["funnel"], input_ids, attention_mask,
                          token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits)


class FunnelDiscriminatorPredictions(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.d_model, config.d_model, True, **kw)
        self.dense_prediction = Linear(config.d_model, 1, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        h = self.act(self.dense(params["dense"], hidden))
        return self.dense_prediction(params["dense_prediction"], h)[..., 0]


class FunnelForPreTraining(FunnelPreTrainedModel):
    """ELECTRA-style replaced-token discriminator (reference :907)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.funnel = FunnelModel(config, **kw)
        self.discriminator_predictions = FunnelDiscriminatorPredictions(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, **kwargs):
        out = self.funnel(params["funnel"], input_ids, attention_mask,
                          token_type_ids)
        logits = self.discriminator_predictions(
            params["discriminator_predictions"], out.last_hidden_state)
        return TokenClassifierOutput(logits=logits)
