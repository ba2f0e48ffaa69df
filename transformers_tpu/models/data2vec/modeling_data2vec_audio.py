"""Data2VecAudio (reference src/transformers/models/data2vec/modeling_data2vec_audio.py).

Wav2Vec2 skeleton with: all-LayerNorm conv feature encoder, and a STACK of
plain (no weight-norm) positional conv layers each followed by a weightless
LayerNorm + GELU (``pos_conv_embed.layers.N.conv``). Prefix ``data2vec_audio``."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2Encoder,
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
    Wav2Vec2Model,
)


class Data2VecAudioConfig(Wav2Vec2Config):
    model_type = "data2vec-audio"

    def __init__(self, conv_pos_kernel_size=19, **kwargs):
        kwargs.setdefault("feat_extract_norm", "layer")
        kwargs.setdefault("num_conv_pos_embeddings", 5)
        super().__init__(**kwargs)
        self.conv_pos_kernel_size = conv_pos_kernel_size


class Data2VecAudioPositionalConvLayer(Module):
    """conv (groups) + pad-trim + weightless LN + gelu (reference)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.hidden = config.hidden_size
        self.kernel = config.conv_pos_kernel_size
        self.groups = config.num_conv_pos_embedding_groups
        self.pad_remove = 1 if self.kernel % 2 == 0 else 0
        self.act = get_activation(config.feat_extract_activation)
        self.eps = 1e-5

    def init(self, rng):
        c, k, g = self.hidden, self.kernel, self.groups
        return {"conv": {"weight": normal_init(0.02)(rng, (c, c // g, k), self.param_dtype),
                         "bias": jnp.zeros((c,), self.param_dtype)}}

    def __call__(self, params, x):  # [B, C, T]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), params["conv"]["weight"].astype(self.dtype),
            window_strides=(1,), padding=[(self.kernel // 2, self.kernel // 2)],
            dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=self.groups)
        y = y + params["conv"]["bias"].astype(self.dtype)[None, :, None]
        if self.pad_remove:
            y = y[:, :, : -self.pad_remove]
        h = jnp.swapaxes(y, 1, 2).astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        return jnp.swapaxes(self.act(h).astype(self.dtype), 1, 2)


class Data2VecAudioPositionalConvEmbedding(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [Data2VecAudioPositionalConvLayer(config, dtype=dtype,
                                                        param_dtype=param_dtype)
                       for _ in range(config.num_conv_pos_embeddings)]

    def __call__(self, params, hidden):  # [B, T, C]
        x = jnp.swapaxes(hidden, 1, 2)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return jnp.swapaxes(x, 1, 2)


class Data2VecAudioEncoder(Wav2Vec2Encoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.pos_conv_embed = Data2VecAudioPositionalConvEmbedding(
            config, dtype=dtype, param_dtype=param_dtype)


class Data2VecAudioModel(Wav2Vec2Model):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.encoder = Data2VecAudioEncoder(config, dtype=dtype, param_dtype=param_dtype)


class Data2VecAudioPreTrainedModel(PreTrainedModel):
    config_class = Data2VecAudioConfig
    base_model_prefix = "data2vec_audio"


class Data2VecAudioModelStandalone(Data2VecAudioPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.data2vec_audio = Data2VecAudioModel(config, dtype=self.dtype,
                                                 param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.data2vec_audio(params["data2vec_audio"], input_values, **kwargs)


class Data2VecAudioForCTC(Data2VecAudioPreTrainedModel, Wav2Vec2ForCTC):
    base_attr = "data2vec_audio"
    model_cls = Data2VecAudioModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForCTC.__init__(self, config, dtype=dtype, param_dtype=param_dtype)


class Data2VecAudioForSequenceClassification(Data2VecAudioPreTrainedModel,
                                             Wav2Vec2ForSequenceClassification):
    base_attr = "data2vec_audio"
    model_cls = Data2VecAudioModel

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForSequenceClassification.__init__(self, config, dtype=dtype,
                                                   param_dtype=param_dtype)
