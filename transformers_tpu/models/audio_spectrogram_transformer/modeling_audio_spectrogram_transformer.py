"""Audio Spectrogram Transformer (reference
models/audio_spectrogram_transformer/modeling_audio_spectrogram_transformer.py).

A ViT over log-mel spectrograms: strided Conv2d patches over the (time, mel)
plane (:75), CLS + distillation tokens (:36), final LayerNorm; the audio
classifier head is LayerNorm+Linear over the mean of both tokens (:404).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutputWithPooling,
                                 SequenceClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ..vit.modeling_vit import ViTEncoder


class ASTConfig(PretrainedConfig):
    model_type = "audio-spectrogram-transformer"

    def __init__(self, hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-12, patch_size=16, qkv_bias=True,
                 frequency_stride=10, time_stride=10, max_length=1024,
                 num_mel_bins=128, **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.patch_size = patch_size
        self.qkv_bias = qkv_bias
        self.frequency_stride = frequency_stride
        self.time_stride = time_stride
        self.max_length = max_length
        self.num_mel_bins = num_mel_bins
        super().__init__(**kwargs)


class ASTEmbeddings(Module):
    def __init__(self, config: ASTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.f_out = (config.num_mel_bins - config.patch_size) // config.frequency_stride + 1
        self.t_out = (config.max_length - config.patch_size) // config.time_stride + 1
        self.num_patches = self.f_out * self.t_out

    def init(self, rng):
        import jax

        c = self.config
        k1, k2, k3 = jax.random.split(rng, 3)
        init = normal_init(c.initializer_range)
        return {
            "cls_token": init(k1, (1, 1, c.hidden_size), self.param_dtype),
            "distillation_token": init(k2, (1, 1, c.hidden_size), self.param_dtype),
            "position_embeddings": init(k3, (1, self.num_patches + 2, c.hidden_size),
                                        self.param_dtype),
            "patch_embeddings": {"projection": {
                "weight": init(rng, (c.hidden_size, 1, c.patch_size, c.patch_size),
                               self.param_dtype),
                "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}},
        }

    def __call__(self, params, input_values):  # [B, max_length, num_mel_bins]
        import jax

        c = self.config
        # [B, T, F] -> [B, 1, F, T]: the conv walks (freq, time) with strides
        # (frequency_stride, time_stride) (reference :88-94 transpose(2, 3))
        x = input_values[:, None, :, :].transpose(0, 1, 3, 2)
        w = params["patch_embeddings"]["projection"]["weight"].astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, (c.frequency_stride, c.time_stride),
            [(0, 0), (0, 0)], dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = y + params["patch_embeddings"]["projection"]["bias"].astype(jnp.float32)[None, :, None, None]
        b = y.shape[0]
        patches = y.reshape(b, c.hidden_size, -1).transpose(0, 2, 1).astype(self.dtype)
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype), (b, 1, c.hidden_size))
        dist = jnp.broadcast_to(params["distillation_token"].astype(self.dtype),
                                (b, 1, c.hidden_size))
        h = jnp.concatenate([cls, dist, patches], axis=1)
        return h + params["position_embeddings"].astype(self.dtype)


class ASTPreTrainedModel(PreTrainedModel):
    config_class = ASTConfig
    base_model_prefix = "audio_spectrogram_transformer"
    main_input_name = "input_values"


class ASTModel(ASTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = ASTEmbeddings(config, **kw)
        self.encoder = ViTEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, input_values, output_hidden_states=False, **kwargs):
        hidden = self.embeddings(params["embeddings"], input_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden,
                                          output_hidden_states, None)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = (hidden[:, 0] + hidden[:, 1]) / 2
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class ASTForAudioClassification(ASTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_spectrogram_transformer = ASTModel(config, **kw)
        head = Module(dtype=self.dtype, param_dtype=self.param_dtype)
        head.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        head.dense = Linear(config.hidden_size, config.num_labels, True,
                            kernel_init=normal_init(config.initializer_range), **kw)
        self.classifier = head

    def __call__(self, params, input_values, labels=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.audio_spectrogram_transformer(
            params["audio_spectrogram_transformer"], input_values,
            output_hidden_states)
        h = self.classifier.layernorm(params["classifier"]["layernorm"],
                                      outputs.pooler_output)
        logits = self.classifier.dense(params["classifier"]["dense"], h)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=outputs.hidden_states)
