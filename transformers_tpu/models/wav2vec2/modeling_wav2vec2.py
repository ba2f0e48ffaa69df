"""Wav2Vec2 speech encoder, TPU-native.

Semantics match reference src/transformers/models/wav2vec2/modeling_wav2vec2.py:
conv feature encoder with group/layer/no-norm variants (:254-420),
weight-normed positional conv embedding with same-pad trim (:326-380,
weight-norm kept FUNCTIONAL: g/v parametrization leaves load verbatim and the
normalized weight is computed in the forward pass, exactly torch's
parametrized module), pre/post-LN encoder variants per
``do_stable_layer_norm`` (:575-655), feature projection (:422), CTC head with
conv-stride-derived input lengths (:997, :1704-1708) and optax CTC loss, and
the projector+mean-pool sequence classifier (:1755-1758).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, GroupNorm, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, CausalLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_wav2vec2 import Wav2Vec2Config


class Wav2Vec2ConvLayer(Module):
    """One feature-encoder conv with optional norm (reference :254-325)."""

    def __init__(self, config, layer_id: int, norm: Optional[str], *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        in_dim = config.conv_dim[layer_id - 1] if layer_id > 0 else 1
        out_dim = config.conv_dim[layer_id]
        self.conv = Conv(in_dim, out_dim, config.conv_kernel[layer_id],
                         stride=config.conv_stride[layer_id], use_bias=config.conv_bias,
                         ndim=1, dtype=dtype, param_dtype=param_dtype)
        self.norm = norm
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if norm == "group":
            self.layer_norm = GroupNorm(out_dim, out_dim, **kw)
        elif norm == "layer":
            self.layer_norm = LayerNorm(out_dim, **kw)
        self.act = get_activation(config.feat_extract_activation)

    def __call__(self, params, x):  # x [B, C, T]
        x = self.conv(params["conv"], x)
        if self.norm == "group":
            x = self.layer_norm(params["layer_norm"], x)
        elif self.norm == "layer":
            x = jnp.swapaxes(self.layer_norm(params["layer_norm"], jnp.swapaxes(x, 1, 2)), 1, 2)
        return self.act(x)


class Wav2Vec2FeatureEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        n = config.num_feat_extract_layers
        if config.feat_extract_norm == "group":
            norms = ["group"] + [None] * (n - 1)
        else:
            norms = ["layer"] * n
        self.conv_layers = [Wav2Vec2ConvLayer(config, i, norms[i], **kw) for i in range(n)]

    def __call__(self, params, input_values):  # [B, T] raw waveform
        x = input_values[:, None, :]
        for i, layer in enumerate(self.conv_layers):
            x = layer(params["conv_layers"][str(i)], x)
        return x  # [B, C, T']


class Wav2Vec2PositionalConvEmbedding(Module):
    """Grouped conv with torch weight-norm parametrization (reference :326).
    The g/v leaves (``parametrizations.weight.original0/1``) are model params;
    the effective weight g * v/||v|| (norm over dims 0,1 — torch dim=2) is
    computed per forward, so fine-tuning matches torch's reparameterized
    gradients."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.hidden = config.hidden_size
        self.kernel = config.num_conv_pos_embeddings
        self.groups = config.num_conv_pos_embedding_groups
        self.pad_remove = 1 if config.num_conv_pos_embeddings % 2 == 0 else 0
        self.act = get_activation(config.feat_extract_activation)
        self.stride = 1  # SEW sets squeeze_factor

    def init(self, rng):
        c, k, g = self.hidden, self.kernel, self.groups
        v = normal_init(0.02)(rng, (c, c // g, k), self.param_dtype)
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1), keepdims=True))
        return {"conv": {
            "bias": jnp.zeros((c,), self.param_dtype),
            "parametrizations": {"weight": {
                "original0": norm.astype(self.param_dtype),  # g [1, 1, K]
                "original1": v,                              # v [C, C/g, K]
            }},
        }}

    def __call__(self, params, hidden):  # [B, T, C]
        p = params["conv"]["parametrizations"]["weight"]
        g = p["original0"].astype(jnp.float32)
        v = p["original1"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        w = (g * v / norm).astype(self.dtype)
        x = jnp.swapaxes(hidden, 1, 2)  # [B, C, T]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(self.stride,),
            padding=[(self.kernel // 2, self.kernel // 2)],
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=self.groups)
        y = y + params["conv"]["bias"].astype(self.dtype)[None, :, None]
        if self.pad_remove:
            y = y[:, :, : -self.pad_remove]
        return jnp.swapaxes(self.act(y), 1, 2)


class Wav2Vec2FeatureProjection(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = LayerNorm(config.conv_dim[-1], config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)
        self.projection = Linear(config.conv_dim[-1], config.hidden_size, True,
                                 dtype=dtype, param_dtype=param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        return self.projection(params["projection"], self.layer_norm(params["layer_norm"], x))


class Wav2Vec2Attention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.k_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.v_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.out_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, attn_args):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e))


class Wav2Vec2FeedForward(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.intermediate_dense = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.output_dense = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.output_dense(params["output_dense"],
                                 self.act(self.intermediate_dense(params["intermediate_dense"], x)))


class Wav2Vec2EncoderLayer(Module):
    """Post-LN (default) or stable pre-LN block (reference :575/:611)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.stable = config.do_stable_layer_norm
        self.attention = Wav2Vec2Attention(config, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.feed_forward = Wav2Vec2FeedForward(config, **kw)
        self.final_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, attn_args):
        if self.stable:
            h = self.layer_norm(params["layer_norm"], hidden)
            hidden = hidden + self.attention(params["attention"], h, attn_args)
            return hidden + self.feed_forward(
                params["feed_forward"], self.final_layer_norm(params["final_layer_norm"], hidden))
        hidden = hidden + self.attention(params["attention"], hidden, attn_args)
        hidden = self.layer_norm(params["layer_norm"], hidden)
        hidden = hidden + self.feed_forward(params["feed_forward"], hidden)
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class Wav2Vec2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.stable = config.do_stable_layer_norm
        self.pos_conv_embed = Wav2Vec2PositionalConvEmbedding(config, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layers = [Wav2Vec2EncoderLayer(config, **kw) for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attention_mask=None, output_hidden_states=False):
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden = hidden + self.pos_conv_embed(params["pos_conv_embed"], hidden)
        if not self.stable:
            hidden = self.layer_norm(params["layer_norm"], hidden)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layers"][str(i)], hidden, attn_args)
        if self.stable:
            hidden = self.layer_norm(params["layer_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class Wav2Vec2Model(Module):
    def __init__(self, config: Wav2Vec2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_extractor = Wav2Vec2FeatureEncoder(config, **kw)
        self.feature_projection = Wav2Vec2FeatureProjection(config, **kw)
        self.encoder = Wav2Vec2Encoder(config, **kw)
        if config.apply_spec_augment:
            self.masked_spec_embed_size = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        if getattr(self, "masked_spec_embed_size", None):
            params["masked_spec_embed"] = jax.random.uniform(
                rng, (self.masked_spec_embed_size,), self.param_dtype)
        return params

    def __call__(self, params, input_values, attention_mask=None,
                 output_hidden_states=False) -> BaseModelOutput:
        feats = self.feature_extractor(params["feature_extractor"], jnp.asarray(input_values, self.dtype))
        feats = jnp.swapaxes(feats, 1, 2)  # [B, T', C]
        hidden = self.feature_projection(params["feature_projection"], feats)
        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_vector_attention_mask(self.config, attention_mask, feats.shape[1])
        hidden, all_hidden = self.encoder(params["encoder"], hidden, feat_mask, output_hidden_states)
        return BaseModelOutput(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


def feat_extract_output_lengths(config, input_lengths):
    """Conv output lengths (reference :997-1016)."""
    lengths = input_lengths
    for kernel, stride in zip(config.conv_kernel, config.conv_stride):
        lengths = (lengths - kernel) // stride + 1
    return lengths


def feature_vector_attention_mask(config, attention_mask, feat_len):
    """[B, T'] mask over conv outputs (reference :1018-1030)."""
    out_lengths = feat_extract_output_lengths(config, attention_mask.sum(-1))
    return (jnp.arange(feat_len)[None, :] < out_lengths[:, None]).astype(jnp.int32)


class Wav2Vec2PreTrainedModel(PreTrainedModel):
    config_class = Wav2Vec2Config
    base_model_prefix = "wav2vec2"
    main_input_name = "input_values"
    _keys_to_ignore_on_load_unexpected = (r"quantizer\.", r"project_q\.", r"project_hid\.")


class Wav2Vec2ModelStandalone(Wav2Vec2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.wav2vec2 = Wav2Vec2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.wav2vec2(params["wav2vec2"], input_values, **kwargs)


class Wav2Vec2ForCTC(Wav2Vec2PreTrainedModel):
    """CTC head (reference :1595-1720); loss via optax.ctc_loss with blank =
    pad_token_id, lengths derived from the conv stack. ``base_attr``/
    ``model_cls`` hooks let UniSpeech/SEW/Data2VecAudio reuse this head."""

    base_attr = "wav2vec2"
    model_cls: type = None  # set below (class not yet defined)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        setattr(self, self.base_attr,
                self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype))
        self.lm_head = Linear(config.output_hidden_size, config.vocab_size, True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_values=None, attention_mask=None, labels=None,
                 **kwargs) -> CausalLMOutput:
        out = getattr(self, self.base_attr)(params[self.base_attr], input_values,
                                            attention_mask, **kwargs)
        logits = self.lm_head(params["lm_head"], out.last_hidden_state)
        loss = None
        if labels is not None:
            import optax

            b, t, _ = logits.shape
            if attention_mask is None:
                attention_mask = jnp.ones(jnp.asarray(input_values).shape[:2], jnp.int32)
            in_lengths = feat_extract_output_lengths(self.config, attention_mask.sum(-1))
            logit_pad = (jnp.arange(t)[None, :] >= in_lengths[:, None]).astype(jnp.float32)
            label_pad = (labels < 0).astype(jnp.float32)
            safe_labels = jnp.maximum(labels, 0)
            per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad,
                                     safe_labels, label_pad,
                                     blank_id=self.config.pad_token_id)
            if self.config.ctc_loss_reduction == "mean":
                target_lengths = (1.0 - label_pad).sum(-1)
                loss = jnp.mean(per_seq / jnp.maximum(target_lengths, 1.0))
            else:
                loss = jnp.sum(per_seq)
        return CausalLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class Wav2Vec2ForSequenceClassification(Wav2Vec2PreTrainedModel):
    """projector -> masked mean pool -> classifier (reference :1755-1790);
    optional weighted layer sum."""

    base_attr = "wav2vec2"
    model_cls: type = None

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        setattr(self, self.base_attr,
                self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype))
        self.projector = Linear(config.hidden_size, config.classifier_proj_size, True, **kw)
        self.classifier = Linear(config.classifier_proj_size, config.num_labels, True, **kw)
        self.use_weighted_layer_sum = config.use_weighted_layer_sum
        self.num_layers = config.num_hidden_layers + 1

    def init(self, rng):
        params = super().init(rng)
        if self.use_weighted_layer_sum:
            params["layer_weights"] = jnp.full((self.num_layers,), 1.0 / self.num_layers,
                                               self.param_dtype)
        return params

    def __call__(self, params, input_values=None, attention_mask=None, labels=None, **kwargs):
        out = getattr(self, self.base_attr)(
            params[self.base_attr], input_values, attention_mask,
            output_hidden_states=self.use_weighted_layer_sum)
        if self.use_weighted_layer_sum:
            stacked = jnp.stack(out.hidden_states, axis=1)  # [B, L, T, C]
            w = jax.nn.softmax(params["layer_weights"].astype(jnp.float32))
            hidden = jnp.einsum("l,bltc->btc", w, stacked.astype(jnp.float32)).astype(self.dtype)
        else:
            hidden = out.last_hidden_state
        hidden = self.projector(params["projector"], hidden)
        if attention_mask is not None:
            mask = feature_vector_attention_mask(self.config, attention_mask, hidden.shape[1])
            mask = mask[..., None].astype(hidden.dtype)
            pooled = (hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
        else:
            pooled = hidden.mean(1)
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


Wav2Vec2ForCTC.model_cls = Wav2Vec2Model
Wav2Vec2ForSequenceClassification.model_cls = Wav2Vec2Model
