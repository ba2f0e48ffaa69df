"""Parakeet — FastConformer ASR with CTC / RNN-T / TDT heads, TPU-native
(reference src/transformers/models/parakeet/modeling_parakeet.py).

Encoder: 2D conv subsampling (:365), Transformer-XL relative-position
attention with bias_u/bias_v and the rel-shift trick (:267), conformer
blocks with half-step FFNs and a GLU depthwise-conv module (:124).
Transducer training uses the associative-scan RNNT / wavefront TDT losses
in loss/transducer.py; greedy transducer decoding is a host loop over a
jitted joint step (blank advances the frame pointer; TDT advances by the
predicted duration, reference generation_parakeet.py:125/:271)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import (
    BatchNorm,
    Conv,
    Embedding,
    LayerNorm,
    Linear,
    Module,
    normal_init,
)
from ...modeling_outputs import CausalLMOutput, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_parakeet import (
    ParakeetCTCConfig,
    ParakeetEncoderConfig,
    ParakeetRNNTConfig,
    ParakeetTDTConfig,
)


@dataclass
class ParakeetEncoderModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None
    attention_mask: Optional[jnp.ndarray] = None


@dataclass
class ParakeetRNNTOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None


def relative_positional_encoding(hidden, hidden_size):
    """[B, 2S-1, H] interleaved sin/cos over descending positions (reference :85)."""
    b, s = hidden.shape[:2]
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, hidden_size, 2, dtype=np.float32)
                                  / hidden_size))
    positions = jnp.arange(s - 1, -s, -1, dtype=jnp.float32)
    freqs = positions[:, None] * jnp.asarray(inv_freq)[None, :]  # [2S-1, H/2]
    pos = jnp.stack([jnp.sin(freqs), jnp.cos(freqs)], axis=-1).reshape(2 * s - 1, -1)
    return jnp.broadcast_to(pos[None], (b, 2 * s - 1, hidden_size)).astype(hidden.dtype)


class ParakeetEncoderFeedForward(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.linear1 = Linear(config.hidden_size, config.intermediate_size,
                              use_bias=config.attention_bias, **kw)
        self.linear2 = Linear(config.intermediate_size, config.hidden_size,
                              use_bias=config.attention_bias, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.linear2(params["linear2"], self.act(self.linear1(params["linear1"], x)))


class ParakeetEncoderConvolutionModule(Module):
    """GLU pointwise + depthwise + BatchNorm conv block (reference :124)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(ndim=1, dtype=dtype, param_dtype=param_dtype)
        c = config.hidden_size
        k = config.conv_kernel_size
        self.pointwise_conv1 = Conv(c, 2 * c, 1, use_bias=config.convolution_bias, **kw)
        self.depthwise_conv = Conv(c, c, k, padding=(k - 1) // 2, groups=c,
                                   use_bias=config.convolution_bias, **kw)
        self.norm = BatchNorm(c, dtype=dtype, param_dtype=param_dtype)
        self.pointwise_conv2 = Conv(c, c, 1, use_bias=config.convolution_bias, **kw)
        self.act = get_activation(getattr(config, "hidden_act", "silu"))

    def __call__(self, params, hidden, valid=None):
        h = jnp.swapaxes(hidden, 1, 2)  # [B, C, T]
        h = self.pointwise_conv1(params["pointwise_conv1"], h)
        a, b = jnp.split(h, 2, axis=1)
        h = a * jax.nn.sigmoid(b)  # GLU over channel dim
        if valid is not None:
            h = jnp.where(valid[:, None, :].astype(bool), h, 0.0)
        h = self.depthwise_conv(params["depthwise_conv"], h)
        h = self.norm(params["norm"], h)
        h = self.act(h)
        h = self.pointwise_conv2(params["pointwise_conv2"], h)
        return jnp.swapaxes(h, 1, 2)


class ParakeetEncoderAttention(Module):
    """Transformer-XL style rel-pos MHA (reference :267)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.heads = config.num_attention_heads
        self.head_dim = h // self.heads
        self.scaling = self.head_dim**-0.5
        bias = config.attention_bias
        self.q_proj = Linear(h, h, use_bias=bias, **kw)
        self.k_proj = Linear(h, h, use_bias=bias, **kw)
        self.v_proj = Linear(h, h, use_bias=bias, **kw)
        self.o_proj = Linear(h, h, use_bias=bias, **kw)
        self.relative_k_proj = Linear(h, h, use_bias=False, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["bias_u"] = jnp.zeros((self.heads, self.head_dim), self.param_dtype)
        params["bias_v"] = jnp.zeros((self.heads, self.head_dim), self.param_dtype)
        return params

    @staticmethod
    def _rel_shift(scores):
        """[B, h, S, P] Transformer-XL shift (reference :355)."""
        b, h, q, p = scores.shape
        scores = jnp.pad(scores, ((0, 0), (0, 0), (0, 0), (1, 0)))
        scores = scores.reshape(b, h, p + 1, q)[:, :, 1:]
        return scores.reshape(b, h, q, p)

    def __call__(self, params, hidden, pos_embed, valid=None):
        b, s, _ = hidden.shape
        split = lambda x: jnp.swapaxes(x.reshape(b, -1, self.heads, self.head_dim), 1, 2)
        q = split(self.q_proj(params["q_proj"], hidden))
        k = split(self.k_proj(params["k_proj"], hidden))
        v = split(self.v_proj(params["v_proj"], hidden))
        bias_u = params["bias_u"].astype(q.dtype)[None, :, None, :]
        bias_v = params["bias_v"].astype(q.dtype)[None, :, None, :]

        rel_k = self.relative_k_proj(params["relative_k_proj"], pos_embed)
        rel_k = rel_k.reshape(b, -1, self.heads, self.head_dim)
        # terms (b)+(d)
        bd = jnp.einsum("bhtd,bphd->bhtp", q + bias_v, rel_k)
        bd = self._rel_shift(bd)[..., :s] * self.scaling
        if valid is not None:
            keep = (valid[:, None, :, None] * valid[:, None, None, :]).astype(bool)
            bd = jnp.where(keep, bd, jnp.finfo(jnp.float32).min)
        # terms (a)+(c) + bd
        scores = jnp.einsum("bhtd,bhsd->bhts", (q + bias_u) * self.scaling, k) + bd
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        if valid is not None:
            # fully-masked (padded) query rows output 0, matching torch SDPA
            probs = probs * valid[:, None, :, None].astype(probs.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class _ReLU(Module):
    """Index-preserving placeholder for torch's in-list nn.ReLU modules."""

    def init(self, rng):
        return {}

    def __call__(self, params, x):
        return jax.nn.relu(x)


class ParakeetEncoderSubsamplingConv2D(Module):
    """log2(factor) strided 2D convs over [B, 1, T, mel] (reference :365)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(ndim=2, dtype=dtype, param_dtype=param_dtype)
        k = config.subsampling_conv_kernel_size
        st = config.subsampling_conv_stride
        ch = config.subsampling_conv_channels
        pad = (k - 1) // 2
        self.num_layers = int(math.log2(config.subsampling_factor))
        self.stride = st
        self.kernel_size = k
        self.padding = pad
        # torch interleaves nn.ReLU modules in the same ModuleList, so conv
        # checkpoint keys land on indices 0, 2, 3, 5, 6, ... — placeholder
        # weightless entries keep our indices aligned (reference :383)
        relu = lambda: _ReLU(dtype=dtype, param_dtype=param_dtype)
        layers = [Conv(1, ch, k, stride=st, padding=pad, **kw), relu()]
        for _ in range(self.num_layers - 1):
            layers.append(Conv(ch, ch, k, stride=st, padding=pad, groups=ch, **kw))
            layers.append(Conv(ch, ch, 1, **kw))
            layers.append(relu())
        self.layers = layers
        out_length = config.num_mel_bins // (st**self.num_layers)
        self.linear = Linear(ch * out_length, config.hidden_size,
                             dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_features, attention_mask=None):
        h = input_features[:, None, :, :]  # [B, 1, T, mel]
        lengths = attention_mask.sum(-1) if attention_mask is not None else None

        def mask_after_conv(h, lengths, strided):
            # torch masks hidden states after EVERY Conv2d (reference :424);
            # lengths shrink only through strided convs
            if lengths is None:
                return h, lengths
            if strided:
                lengths = (lengths + 2 * self.padding - self.kernel_size) \
                    // self.stride + 1
            keep = jnp.arange(h.shape[2])[None, :] < lengths[:, None]
            return h * keep[:, None, :, None].astype(h.dtype), lengths

        for i, layer in enumerate(self.layers):
            if isinstance(layer, _ReLU):
                h = jax.nn.relu(h)
                continue
            h = layer(params["layers"][str(i)], h)
            h, lengths = mask_after_conv(h, lengths, layer.stride != (1, 1))
        b, c, t, f = h.shape
        h = jnp.swapaxes(h, 1, 2).reshape(b, t, c * f)
        return self.linear(params["linear"], h), lengths


class ParakeetEncoderBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.feed_forward1 = ParakeetEncoderFeedForward(config, **kw)
        self.self_attn = ParakeetEncoderAttention(config, **kw)
        self.conv = ParakeetEncoderConvolutionModule(config, **kw)
        self.feed_forward2 = ParakeetEncoderFeedForward(config, **kw)
        self.norm_feed_forward1 = LayerNorm(h, 1e-5, **kw)
        self.norm_self_att = LayerNorm(h, 1e-5, **kw)
        self.norm_conv = LayerNorm(h, 1e-5, **kw)
        self.norm_feed_forward2 = LayerNorm(h, 1e-5, **kw)
        self.norm_out = LayerNorm(h, 1e-5, **kw)

    def __call__(self, params, hidden, pos_embed, valid=None):
        h = self.feed_forward1(params["feed_forward1"],
                               self.norm_feed_forward1(params["norm_feed_forward1"], hidden))
        hidden = hidden + 0.5 * h
        h = self.self_attn(params["self_attn"],
                           self.norm_self_att(params["norm_self_att"], hidden),
                           pos_embed, valid)
        hidden = hidden + h
        h = self.conv(params["conv"], self.norm_conv(params["norm_conv"], hidden), valid)
        hidden = hidden + h
        h = self.feed_forward2(params["feed_forward2"],
                               self.norm_feed_forward2(params["norm_feed_forward2"], hidden))
        hidden = hidden + 0.5 * h
        return self.norm_out(params["norm_out"], hidden)


class ParakeetPreTrainedModel(PreTrainedModel):
    config_class = ParakeetCTCConfig
    base_model_prefix = "model"
    main_input_name = "input_features"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)

    def _subsampling_output_length(self, input_lengths):
        enc = getattr(self.config, "encoder_config", self.config)
        k = enc.subsampling_conv_kernel_size
        st = enc.subsampling_conv_stride
        n = int(math.log2(enc.subsampling_factor))
        add_pad = (k - 1) // 2 * 2 - k
        lengths = np.asarray(input_lengths, np.float64)
        for _ in range(n):
            lengths = np.floor((lengths + add_pad) / st + 1.0)
        return lengths.astype(np.int32)


class _ParakeetEncoderCore(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.input_scale = math.sqrt(config.hidden_size) if config.scale_input else 1.0
        self.subsampling = ParakeetEncoderSubsamplingConv2D(config, **kw)
        self.layers = [ParakeetEncoderBlock(config, **kw)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, input_features, attention_mask=None):
        h, lengths = self.subsampling(params["subsampling"], input_features,
                                      attention_mask)
        h = h * self.input_scale
        pos_embed = relative_positional_encoding(h, self.config.hidden_size)
        valid = None
        if attention_mask is not None:
            valid = (jnp.arange(h.shape[1])[None, :] < lengths[:, None]).astype(jnp.int32)
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, pos_embed, valid)
        return h, valid


class ParakeetEncoder(ParakeetPreTrainedModel):
    config_class = ParakeetEncoderConfig
    base_model_prefix = "encoder"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _ParakeetEncoderCore(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        # expose core children at top level so checkpoint keys resolve the
        # module-tree load transforms without a wrapper prefix
        for name, child in core.children.items():
            setattr(self, name, child)
        object.__setattr__(self, "_core", core)

    def __call__(self, params, input_features, attention_mask=None, **kwargs):
        h, valid = self._core(params, input_features, attention_mask)
        return ParakeetEncoderModelOutput(last_hidden_state=h, attention_mask=valid)


class ParakeetForCTC(ParakeetPreTrainedModel):
    config_class = ParakeetCTCConfig

    def __init__(self, config: ParakeetCTCConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = _ParakeetEncoderCore(config.encoder_config, **kw)
        self.ctc_head = Conv(config.encoder_config.hidden_size, config.vocab_size, 1,
                             ndim=1, **kw)

    def __call__(self, params, input_features, attention_mask=None, labels=None,
                 **kwargs):
        h, valid = self.encoder(params["encoder"], input_features, attention_mask)
        logits = jnp.swapaxes(
            self.ctc_head(params["ctc_head"], jnp.swapaxes(h, 1, 2)), 1, 2)
        loss = None
        if labels is not None:
            import optax

            t = logits.shape[1]
            lengths = (valid.sum(-1) if valid is not None
                       else jnp.full((h.shape[0],), t, jnp.int32))
            logit_pad = (jnp.arange(t)[None, :] >= lengths[:, None]).astype(jnp.float32)
            label_pad = (labels == self.config.pad_token_id).astype(jnp.float32)
            per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad,
                                     jnp.maximum(labels, 0), label_pad,
                                     blank_id=self.config.pad_token_id)
            if self.config.ctc_loss_reduction == "mean":
                target_lengths = (1.0 - label_pad).sum(-1)
                loss = jnp.mean(per_seq / jnp.maximum(target_lengths, 1.0))
            else:
                loss = jnp.sum(per_seq)
        return CausalLMOutput(loss=loss, logits=logits)

    def generate(self, params=None, input_features=None, attention_mask=None, **kwargs):
        params = params if params is not None else self.params
        out = self(params, input_features, attention_mask)
        sequences = jnp.argmax(out.logits, axis=-1)
        if attention_mask is not None:
            lengths = self._subsampling_output_length(
                np.asarray(attention_mask).sum(-1))
            keep = np.arange(sequences.shape[1])[None, :] < lengths[:, None]
            sequences = jnp.where(jnp.asarray(keep), sequences,
                                  self.config.pad_token_id)
        return sequences


class ParakeetRNNTDecoder(Module):
    """Embedding + stacked LSTM prediction network (reference :831)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.hidden = config.decoder_hidden_size
        self.num_layers = config.num_decoder_layers
        self.embedding = Embedding(config.vocab_size, config.decoder_hidden_size,
                                   embedding_init=normal_init(0.02), **kw)
        self.decoder_projector = Linear(config.decoder_hidden_size,
                                        config.decoder_hidden_size, **kw)

    def init(self, rng):
        params = super().init(rng)
        bound = 1.0 / math.sqrt(self.hidden)
        lstm = {}
        for l in range(self.num_layers):
            for name in (f"weight_ih_l{l}", f"weight_hh_l{l}"):
                rng, k = jax.random.split(rng)
                lstm[name] = jax.random.uniform(
                    k, (4 * self.hidden, self.hidden), self.param_dtype, -bound, bound)
            for name in (f"bias_ih_l{l}", f"bias_hh_l{l}"):
                rng, k = jax.random.split(rng)
                lstm[name] = jax.random.uniform(
                    k, (4 * self.hidden,), self.param_dtype, -bound, bound)
        params["lstm"] = lstm
        return params

    def _lstm(self, params, x, state=None):
        """x [B, U, H]; returns (out [B, U, H], (h, c) each [L, B, H])."""
        out = x.astype(jnp.float32)
        hs, cs = [], []
        for l in range(self.num_layers):
            w_ih = params["lstm"][f"weight_ih_l{l}"].astype(jnp.float32)
            w_hh = params["lstm"][f"weight_hh_l{l}"].astype(jnp.float32)
            b = (params["lstm"][f"bias_ih_l{l}"]
                 + params["lstm"][f"bias_hh_l{l}"]).astype(jnp.float32)
            xproj = jnp.einsum("buh,gh->bug", out, w_ih) + b

            def step(carry, xt):
                hp, cp = carry
                gates = xt + jnp.dot(hp, w_hh.T)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(g)
                hn = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (hn, c), hn

            bsz = out.shape[0]
            init = ((state[0][l].astype(jnp.float32), state[1][l].astype(jnp.float32))
                    if state is not None
                    else (jnp.zeros((bsz, self.hidden)), jnp.zeros((bsz, self.hidden))))
            (hf, cf), seq = jax.lax.scan(step, init, jnp.swapaxes(xproj, 0, 1))
            out = jnp.swapaxes(seq, 0, 1)
            hs.append(hf)
            cs.append(cf)
        return out.astype(x.dtype), (jnp.stack(hs), jnp.stack(cs))

    def __call__(self, params, input_ids, state=None):
        emb = self.embedding(params["embedding"], input_ids)
        out, state = self._lstm(params, emb, state)
        return self.decoder_projector(params["decoder_projector"], out), state


class ParakeetRNNTJointNetwork(Module):
    def __init__(self, config, out_size=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.head = Linear(config.decoder_hidden_size,
                           out_size or config.vocab_size,
                           dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, decoder_hidden, encoder_hidden):
        return self.head(params["head"], self.act(encoder_hidden + decoder_hidden))


class ParakeetForRNNT(ParakeetPreTrainedModel):
    config_class = ParakeetRNNTConfig
    joint_out_size = None

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = _ParakeetEncoderCore(config.encoder_config, **kw)
        self.encoder_projector = Linear(config.encoder_config.hidden_size,
                                        config.decoder_hidden_size, **kw)
        self.decoder = ParakeetRNNTDecoder(config, **kw)
        out = self.joint_out_size
        self.joint = ParakeetRNNTJointNetwork(config, out, **kw)

    def get_audio_features(self, params, input_features, attention_mask=None):
        h, valid = self.encoder(params["encoder"], input_features, attention_mask)
        proj = self.encoder_projector(params["encoder_projector"], h)
        return ParakeetEncoderModelOutput(last_hidden_state=h, pooler_output=proj,
                                          attention_mask=valid)

    def __call__(self, params, input_features=None, attention_mask=None,
                 decoder_input_ids=None, labels=None, encoder_outputs=None, **kwargs):
        if encoder_outputs is None:
            encoder_outputs = self.get_audio_features(params, input_features,
                                                      attention_mask)
        dec, _ = self.decoder(params["decoder"], decoder_input_ids)
        logits = self.joint(params["joint"], dec[:, None, :, :],
                            encoder_outputs.pooler_output[:, :, None, :])
        loss = None
        if labels is not None:
            loss = self._transducer_loss(logits, labels, encoder_outputs)
        return ParakeetRNNTOutput(loss=loss, logits=logits,
                                  last_hidden_state=encoder_outputs.last_hidden_state,
                                  pooler_output=encoder_outputs.pooler_output)

    def _transducer_loss(self, logits, labels, encoder_outputs):
        from ...loss.transducer import rnnt_loss

        valid = encoder_outputs.attention_mask
        t = logits.shape[1]
        logit_lengths = (valid.sum(-1) if valid is not None
                         else jnp.full((logits.shape[0],), t, jnp.int32))
        label_lengths = (labels != self.config.blank_token_id).sum(-1)
        return rnnt_loss(logits, labels, logit_lengths, label_lengths,
                         blank_token_id=self.config.blank_token_id)

    # -------------------------------------------------------------- greedy
    def generate(self, params=None, input_features=None, attention_mask=None,
                 **kwargs):
        """Greedy transducer decode (reference generation_parakeet.py:125):
        blank advances the encoder frame; non-blank feeds the prediction
        network; max_symbols_per_step forces progress."""
        params = params if params is not None else self.params
        enc = self.get_audio_features(params, input_features, attention_mask)
        pooler = np.asarray(enc.pooler_output)
        b, t_max, _ = pooler.shape
        lengths = (np.asarray(enc.attention_mask).sum(-1)
                   if enc.attention_mask is not None
                   else np.full((b,), t_max, np.int64))
        blank = self.config.blank_token_id
        durations = getattr(self.config, "durations", None)

        @jax.jit
        def joint_step(p, dec_out, enc_frame):
            return self.joint(p["joint"], dec_out, enc_frame)

        @jax.jit
        def dec_step(p, token, state):
            out, new_state = self.decoder(p["decoder"], token, state)
            return out, new_state

        L, H = self.config.num_decoder_layers, self.config.decoder_hidden_size
        state = (jnp.zeros((L, b, H)), jnp.zeros((L, b, H)))
        # generate() seeds the decoder with the start token (blank SOS,
        # reference GenerationMixin prepends decoder_start_token_id)
        start = getattr(self.config, "decoder_start_token_id", None)
        start = blank if start is None else start
        dec_out, state = dec_step(params, jnp.full((b, 1), start, jnp.int32), state)
        frame = np.zeros((b,), np.int64)
        symbols_at_frame = np.zeros((b,), np.int64)
        sequences = [[] for _ in range(b)]
        finished = frame >= lengths
        # reference sizes the output buffer to max_symbols_per_step * enc_len
        # INCLUDING the prepended start token (generation_parakeet.py:176)
        max_steps = int(self.config.max_symbols_per_step * t_max) - 1

        for _ in range(max_steps):
            if finished.all():
                break
            idx = np.clip(frame, 0, t_max - 1)
            enc_frame = jnp.asarray(pooler[np.arange(b), idx])[:, None, :]
            logits = np.asarray(joint_step(params, dec_out, enc_frame))[:, 0]
            if durations is not None:
                tokens = logits[:, : self.config.vocab_size].argmax(-1)
                dur_idx = logits[:, self.config.vocab_size:].argmax(-1)
                dur = np.asarray(durations)[dur_idx]
                blank_mask = tokens == blank
                dur = np.where(blank_mask & (dur == 0), 1, dur)
                advance = dur
                force = np.zeros_like(blank_mask)
            else:
                tokens = logits.argmax(-1)
                blank_mask = tokens == blank
                symbols = np.where(blank_mask, 0, symbols_at_frame + 1)
                force = symbols >= self.config.max_symbols_per_step
                symbols_at_frame = np.where(blank_mask | force, 0, symbols)
                advance = (blank_mask | force).astype(np.int64)
            emit = (~blank_mask) & (~finished)
            for i in np.nonzero(emit)[0]:
                sequences[i].append(int(tokens[i]))
            # prediction network advances only on non-blank emissions
            if emit.any():
                new_out, new_state = dec_step(
                    params, jnp.asarray(tokens[:, None].astype(np.int32)), state)
                keep = jnp.asarray(emit)
                dec_out = jnp.where(keep[:, None, None], new_out, dec_out)
                state = tuple(jnp.where(keep[None, :, None], n, o)
                              for n, o in zip(new_state, state))
            frame = frame + np.where(finished, 0, advance)
            finished = frame >= lengths
        width = max((len(s) for s in sequences), default=0)
        out = np.full((b, max(width, 1)), self.config.pad_token_id, np.int64)
        for i, s in enumerate(sequences):
            out[i, : len(s)] = s
        return jnp.asarray(out)


class ParakeetForTDT(ParakeetForRNNT):
    config_class = ParakeetTDTConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        self.joint_out_size = config.vocab_size + len(config.durations)
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)

    def _transducer_loss(self, logits, labels, encoder_outputs):
        from ...loss.transducer import tdt_loss

        cfg = self.config
        valid = encoder_outputs.attention_mask
        logit_lengths = (valid.sum(-1) if valid is not None
                         else jnp.full((logits.shape[0],), logits.shape[1], jnp.int32))
        label_lengths = (labels != cfg.blank_token_id).sum(-1)
        return tdt_loss(logits[..., : cfg.vocab_size], logits[..., cfg.vocab_size:],
                        labels, logit_lengths, label_lengths,
                        blank_token_id=cfg.blank_token_id, durations=cfg.durations)
