"""HuBERT (reference src/transformers/models/hubert/modeling_hubert.py).

Wav2Vec2 skeleton with:
- optional LayerNorm in the feature projection (``feat_proj_layer_norm``,
  reference :216-230);
- positional conv that is either weight-normed (default, same as wav2vec2)
  or preceded by BatchNorm over channels (``conv_pos_batch_norm``,
  reference :56-90 — inference uses the stored running stats);
- no quantizer/codevector branch.
Checkpoint prefix ``hubert``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, CausalLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2Encoder,
    Wav2Vec2FeatureEncoder,
    Wav2Vec2FeatureProjection,
    Wav2Vec2PositionalConvEmbedding,
    feat_extract_output_lengths,
    feature_vector_attention_mask,
)
from .configuration_hubert import HubertConfig


class HubertFeatureProjection(Wav2Vec2FeatureProjection):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.use_layer_norm = config.feat_proj_layer_norm
        if not self.use_layer_norm:
            self.layer_norm = None
            self._children.pop("layer_norm", None)

    def __call__(self, params, x):
        if self.use_layer_norm:
            x = self.layer_norm(params["layer_norm"], x)
        return self.projection(params["projection"], x)


class HubertBatchNormPositionalConv(Module):
    """BatchNorm (eval mode, running stats) + grouped conv (reference :56-90)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.hidden = config.hidden_size
        self.kernel = config.num_conv_pos_embeddings
        self.groups = config.num_conv_pos_embedding_groups
        self.pad_remove = 1 if config.num_conv_pos_embeddings % 2 == 0 else 0
        self.act = get_activation(config.feat_extract_activation)

    def init(self, rng):
        c, k, g = self.hidden, self.kernel, self.groups
        return {
            "conv": {"weight": normal_init(0.02)(rng, (c, c // g, k), self.param_dtype),
                     "bias": jnp.zeros((c,), self.param_dtype)},
            "batch_norm": {"weight": jnp.ones((c,), self.param_dtype),
                           "bias": jnp.zeros((c,), self.param_dtype),
                           "running_mean": jnp.zeros((c,), self.param_dtype),
                           "running_var": jnp.ones((c,), self.param_dtype),
                           "num_batches_tracked": jnp.zeros((), jnp.int64)},
        }

    def __call__(self, params, hidden):  # [B, T, C]
        x = jnp.swapaxes(hidden, 1, 2).astype(jnp.float32)  # [B, C, T]
        bn = params["batch_norm"]
        mean = bn["running_mean"].astype(jnp.float32)[None, :, None]
        var = bn["running_var"].astype(jnp.float32)[None, :, None]
        w = bn["weight"].astype(jnp.float32)[None, :, None]
        b = bn["bias"].astype(jnp.float32)[None, :, None]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * w + b
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), params["conv"]["weight"].astype(self.dtype),
            window_strides=(1,), padding=[(self.kernel // 2, self.kernel // 2)],
            dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=self.groups)
        y = y + params["conv"]["bias"].astype(self.dtype)[None, :, None]
        if self.pad_remove:
            y = y[:, :, : -self.pad_remove]
        return jnp.swapaxes(self.act(y), 1, 2)


class HubertEncoder(Wav2Vec2Encoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        if getattr(config, "conv_pos_batch_norm", False):
            self.pos_conv_embed = HubertBatchNormPositionalConv(
                config, dtype=dtype, param_dtype=param_dtype)


class HubertModel(Module):
    def __init__(self, config: HubertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_extractor = Wav2Vec2FeatureEncoder(config, **kw)
        self.feature_projection = HubertFeatureProjection(config, **kw)
        self.encoder = HubertEncoder(config, **kw)
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


class HubertPreTrainedModel(PreTrainedModel):
    config_class = HubertConfig
    base_model_prefix = "hubert"
    main_input_name = "input_values"


class HubertModelStandalone(HubertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.hubert = HubertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.hubert(params["hubert"], input_values, **kwargs)


class HubertForCTC(HubertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.hubert = HubertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.lm_head = Linear(config.output_hidden_size, config.vocab_size, True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_values=None, attention_mask=None, labels=None,
                 **kwargs) -> CausalLMOutput:
        out = self.hubert(params["hubert"], input_values, attention_mask, **kwargs)
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


class HubertForSequenceClassification(HubertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.hubert = HubertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
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
        out = self.hubert(params["hubert"], input_values, attention_mask,
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
