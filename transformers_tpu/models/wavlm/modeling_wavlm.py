"""WavLM (reference src/transformers/models/wavlm/modeling_wavlm.py).

Wav2Vec2 skeleton whose attention adds a GATED RELATIVE POSITION BIAS
(reference WavLMAttention :108-186):
- a T5-style log-bucketed relative position table lives on layer 0 only
  (``rel_attn_embed``, :144-145) and the resulting [H, T, T] bias is shared
  by all layers (threaded through the encoder);
- each layer gates the shared bias per (batch, head, query): the query
  heads are projected to 8 dims, folded to two sigmoid gates, and
  ``gate_a * (gate_b * gru_rel_pos_const - 1) + 2`` scales the bias
  (:165-180).
Checkpoint prefix ``wavlm``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, CausalLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.masks import to_additive
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2FeatureEncoder,
    Wav2Vec2FeatureProjection,
    Wav2Vec2FeedForward,
    Wav2Vec2PositionalConvEmbedding,
    feat_extract_output_lengths,
    feature_vector_attention_mask,
)
from ...core.module import LayerNorm
from .configuration_wavlm import WavLMConfig


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5-style log buckets (reference WavLMAttention._relative_positions_bucket
    :253-280), computed host-side — shapes are static."""
    context = np.arange(q_len)[:, None]
    memory = np.arange(k_len)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(max_distance / max_exact)
    large = (max_exact + large * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class WavLMAttention(Module):
    def __init__(self, config, has_relative_position_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.num_buckets = config.num_buckets
        self.max_distance = config.max_bucket_distance
        self.has_bias_table = has_relative_position_bias
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        e = config.hidden_size
        self.q_proj = Linear(e, e, True, **kw)
        self.k_proj = Linear(e, e, True, **kw)
        self.v_proj = Linear(e, e, True, **kw)
        self.out_proj = Linear(e, e, True, **kw)
        self.gru_rel_pos_linear = Linear(self.head_dim, 8, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["gru_rel_pos_const"] = jnp.ones((1, self.num_heads, 1, 1), self.param_dtype)
        if self.has_bias_table:
            params["rel_attn_embed"] = {"weight": normal_init(0.02)(
                rng, (self.num_buckets, self.num_heads), self.param_dtype)}
        return params

    def compute_bias(self, params, q_len, k_len):
        """[H, Q, K] from the bucket table (reference compute_bias :243-251)."""
        buckets = relative_position_buckets(q_len, k_len, self.num_buckets, self.max_distance)
        table = params["rel_attn_embed"]["weight"].astype(jnp.float32)
        values = jnp.take(table, jnp.asarray(buckets).reshape(-1), axis=0)
        return values.reshape(q_len, k_len, self.num_heads).transpose(2, 0, 1)

    def __call__(self, params, hidden, mask_bias, position_bias):
        """hidden [B,T,C]; mask_bias [B,1,1,T] additive or None;
        position_bias [H,T,T] (shared, ungated)."""
        b, t, c = hidden.shape
        h = self.num_heads
        q = self.q_proj(params["q_proj"], hidden).reshape(b, t, h, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, t, h, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, t, h, self.head_dim)

        # gate from the (pre-projection) query hidden states (reference :167-180)
        gated = hidden.reshape(b, t, h, self.head_dim).transpose(0, 2, 1, 3)  # [B,H,T,D]
        proj = self.gru_rel_pos_linear(params["gru_rel_pos_linear"], gated)
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj.astype(jnp.float32))
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # [B,H,T,1]
        const = params["gru_rel_pos_const"].astype(jnp.float32)
        gate_out = gate_a * (gate_b * const - 1.0) + 2.0  # [B,H,T,1]
        gated_bias = gate_out * position_bias[None].astype(jnp.float32)  # [B,H,T,T]

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        scores = scores + gated_bias
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)
        return self.out_proj(params["out_proj"], out)


class WavLMEncoderLayer(Module):
    def __init__(self, config, has_relative_position_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.stable = config.do_stable_layer_norm
        self.attention = WavLMAttention(config, has_relative_position_bias, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.feed_forward = Wav2Vec2FeedForward(config, **kw)
        self.final_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, mask_bias, position_bias):
        if self.stable:
            h = self.layer_norm(params["layer_norm"], hidden)
            hidden = hidden + self.attention(params["attention"], h, mask_bias, position_bias)
            return hidden + self.feed_forward(
                params["feed_forward"], self.final_layer_norm(params["final_layer_norm"], hidden))
        hidden = hidden + self.attention(params["attention"], hidden, mask_bias, position_bias)
        hidden = self.layer_norm(params["layer_norm"], hidden)
        hidden = hidden + self.feed_forward(params["feed_forward"], hidden)
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class WavLMEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.stable = config.do_stable_layer_norm
        self.pos_conv_embed = Wav2Vec2PositionalConvEmbedding(config, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layers = [WavLMEncoderLayer(config, i == 0, **kw)
                       for i in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attention_mask=None, output_hidden_states=False):
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        b, t, _ = hidden.shape
        mask_bias = None
        if attention_mask is not None:
            mask_bias = to_additive(attention_mask.astype(bool)[:, None, None, :], jnp.float32)
        hidden = hidden + self.pos_conv_embed(params["pos_conv_embed"], hidden)
        if not self.stable:
            hidden = self.layer_norm(params["layer_norm"], hidden)
        position_bias = self.layers[0].attention.compute_bias(
            params["layers"]["0"]["attention"], t, t)  # [H, T, T]
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layers"][str(i)], hidden, mask_bias, position_bias)
        if self.stable:
            hidden = self.layer_norm(params["layer_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class WavLMModel(Module):
    def __init__(self, config: WavLMConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_extractor = Wav2Vec2FeatureEncoder(config, **kw)
        self.feature_projection = Wav2Vec2FeatureProjection(config, **kw)
        self.encoder = WavLMEncoder(config, **kw)
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
        feats = self.feature_extractor(params["feature_extractor"],
                                       jnp.asarray(input_values, self.dtype))
        feats = jnp.swapaxes(feats, 1, 2)
        hidden = self.feature_projection(params["feature_projection"], feats)
        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_vector_attention_mask(self.config, attention_mask, feats.shape[1])
        hidden, all_hidden = self.encoder(params["encoder"], hidden, feat_mask, output_hidden_states)
        return BaseModelOutput(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class WavLMPreTrainedModel(PreTrainedModel):
    config_class = WavLMConfig
    base_model_prefix = "wavlm"
    main_input_name = "input_values"


class WavLMModelStandalone(WavLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.wavlm = WavLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.wavlm(params["wavlm"], input_values, **kwargs)


class WavLMForCTC(WavLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.wavlm = WavLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.lm_head = Linear(config.output_hidden_size, config.vocab_size, True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_values=None, attention_mask=None, labels=None,
                 **kwargs) -> CausalLMOutput:
        out = self.wavlm(params["wavlm"], input_values, attention_mask, **kwargs)
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
            per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad,
                                     jnp.maximum(labels, 0), label_pad,
                                     blank_id=self.config.pad_token_id)
            if self.config.ctc_loss_reduction == "mean":
                target_lengths = (1.0 - label_pad).sum(-1)
                loss = jnp.mean(per_seq / jnp.maximum(target_lengths, 1.0))
            else:
                loss = jnp.sum(per_seq)
        return CausalLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class WavLMForSequenceClassification(WavLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.wavlm = WavLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
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
        out = self.wavlm(params["wavlm"], input_values, attention_mask,
                         output_hidden_states=self.use_weighted_layer_sum)
        if self.use_weighted_layer_sum:
            stacked = jnp.stack(out.hidden_states, axis=1)
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
