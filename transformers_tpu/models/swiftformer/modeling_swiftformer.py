"""SwiftFormer (reference models/swiftformer/modeling_swiftformer.py).

Conv-attention hybrid: 4x conv patch stem (Sequential keys ``0``/``1``/
``3``/``4``, :33-57), stages of depthwise ConvEncoder blocks with a final
Efficient Additive Attention block (normalized q/k, learned global-query
vector ``w_g``, :154-192), BatchNorm everywhere, layer-scale residuals, and
a dual head averaging classifier + distillation logits (:449-505).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation


class SwiftFormerConfig(PretrainedConfig):
    model_type = "swiftformer"

    def __init__(self, image_size=224, num_channels=3, depths=(3, 3, 6, 4),
                 embed_dims=(48, 56, 112, 220), mlp_ratio=4,
                 downsamples=(True, True, True, True), hidden_act="gelu",
                 down_patch_size=3, down_stride=2, down_pad=1, drop_path_rate=0.0,
                 drop_mlp_rate=0.0, drop_conv_encoder_rate=0.0, use_layer_scale=True,
                 layer_scale_init_value=1e-5, batch_norm_eps=1e-5, **kwargs):
        self.image_size = image_size
        self.num_channels = num_channels
        self.depths = list(depths)
        self.embed_dims = list(embed_dims)
        self.mlp_ratio = mlp_ratio
        self.downsamples = list(downsamples)
        self.hidden_act = hidden_act
        self.down_patch_size = down_patch_size
        self.down_stride = down_stride
        self.down_pad = down_pad
        self.drop_path_rate = drop_path_rate
        self.drop_mlp_rate = drop_mlp_rate
        self.drop_conv_encoder_rate = drop_conv_encoder_rate
        self.use_layer_scale = use_layer_scale
        self.layer_scale_init_value = layer_scale_init_value
        self.batch_norm_eps = batch_norm_eps
        super().__init__(**kwargs)


class SwiftFormerPatchEmbedding(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        out = config.embed_dims[0]
        seq = Module(**kw)
        setattr(seq, "0", Conv(config.num_channels, out // 2, 3, stride=2, padding=1,
                               use_bias=True, ndim=2, **kw))
        setattr(seq, "1", BatchNorm(out // 2, config.batch_norm_eps, **kw))
        setattr(seq, "3", Conv(out // 2, out, 3, stride=2, padding=1,
                               use_bias=True, ndim=2, **kw))
        setattr(seq, "4", BatchNorm(out, config.batch_norm_eps, **kw))
        self.patch_embedding = seq

    def __call__(self, params, x):
        p = params["patch_embedding"]
        seq = self.patch_embedding
        x = jax.nn.relu(getattr(seq, "1")(p["1"], getattr(seq, "0")(p["0"], x)))
        return jax.nn.relu(getattr(seq, "4")(p["4"], getattr(seq, "3")(p["3"], x)))


class SwiftFormerEmbeddings(Module):
    def __init__(self, config, index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.proj = Conv(config.embed_dims[index], config.embed_dims[index + 1],
                         config.down_patch_size, stride=config.down_stride,
                         padding=config.down_pad, use_bias=True, ndim=2, **kw)
        self.norm = BatchNorm(config.embed_dims[index + 1], config.batch_norm_eps, **kw)

    def __call__(self, params, x):
        return self.norm(params["norm"], self.proj(params["proj"], x))


class SwiftFormerConvEncoder(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hidden = int(config.mlp_ratio * dim)
        self.dim = dim
        self.depth_wise_conv = Conv(dim, dim, 3, padding=1, groups=dim,
                                    use_bias=True, ndim=2, **kw)
        self.norm = BatchNorm(dim, config.batch_norm_eps, **kw)
        self.point_wise_conv1 = Conv(dim, hidden, 1, use_bias=True, ndim=2, **kw)
        self.point_wise_conv2 = Conv(hidden, dim, 1, use_bias=True, ndim=2, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["layer_scale"] = jnp.ones((self.dim, 1, 1), self.param_dtype)
        return params

    def __call__(self, params, x):
        inp = x
        x = self.norm(params["norm"], self.depth_wise_conv(params["depth_wise_conv"], x))
        x = jax.nn.gelu(self.point_wise_conv1(params["point_wise_conv1"], x),
                        approximate=False)
        x = self.point_wise_conv2(params["point_wise_conv2"], x)
        return inp + params["layer_scale"].astype(x.dtype) * x


class SwiftFormerLocalRepresentation(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.depth_wise_conv = Conv(dim, dim, 3, padding=1, groups=dim,
                                    use_bias=True, ndim=2, **kw)
        self.norm = BatchNorm(dim, config.batch_norm_eps, **kw)
        self.point_wise_conv1 = Conv(dim, dim, 1, use_bias=True, ndim=2, **kw)
        self.point_wise_conv2 = Conv(dim, dim, 1, use_bias=True, ndim=2, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["layer_scale"] = jnp.ones((self.dim, 1, 1), self.param_dtype)
        return params

    def __call__(self, params, x):
        inp = x
        x = self.norm(params["norm"], self.depth_wise_conv(params["depth_wise_conv"], x))
        x = jax.nn.gelu(self.point_wise_conv1(params["point_wise_conv1"], x),
                        approximate=False)
        x = self.point_wise_conv2(params["point_wise_conv2"], x)
        return inp + params["layer_scale"].astype(x.dtype) * x


class SwiftFormerEfficientAdditiveAttention(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(0.02))
        self.dim = dim
        self.to_query = Linear(dim, dim, True, **kw)
        self.to_key = Linear(dim, dim, True, **kw)
        self.proj = Linear(dim, dim, True, **kw)
        self.final = Linear(dim, dim, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["w_g"] = jax.random.normal(rng, (self.dim, 1), self.param_dtype)
        return params

    def __call__(self, params, x):  # [B, N, C]
        q = self.to_query(params["to_query"], x)
        k = self.to_key(params["to_key"], x)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        qw = jnp.matmul(q, params["w_g"].astype(q.dtype)) * (self.dim ** -0.5)
        qw = jax.nn.softmax(qw, axis=-1)  # [B, N, 1] (reference softmaxes dim=-1)
        global_q = jnp.sum(qw * q, axis=1, keepdims=True)  # [B, 1, C]
        out = self.proj(params["proj"], global_q * k) + q
        return self.final(params["final"], out)


class SwiftFormerMlp(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hidden = int(dim * config.mlp_ratio)
        self.norm1 = BatchNorm(dim, config.batch_norm_eps, **kw)
        self.fc1 = Conv(dim, hidden, 1, use_bias=True, ndim=2, **kw)
        self.fc2 = Conv(hidden, dim, 1, use_bias=True, ndim=2, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        x = self.norm1(params["norm1"], x)
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class SwiftFormerEncoderBlock(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.use_layer_scale = config.use_layer_scale
        self.layer_scale_init_value = config.layer_scale_init_value
        self.local_representation = SwiftFormerLocalRepresentation(config, dim, **kw)
        self.attn = SwiftFormerEfficientAdditiveAttention(config, dim, **kw)
        self.linear = SwiftFormerMlp(config, dim, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.use_layer_scale:
            params["layer_scale_1"] = jnp.full((self.dim, 1, 1),
                                               self.layer_scale_init_value,
                                               self.param_dtype)
            params["layer_scale_2"] = jnp.full((self.dim, 1, 1),
                                               self.layer_scale_init_value,
                                               self.param_dtype)
        return params

    def __call__(self, params, x):
        x = self.local_representation(params["local_representation"], x)
        b, c, h, w = x.shape
        res = self.attn(params["attn"], x.transpose(0, 2, 3, 1).reshape(b, h * w, c))
        res = res.reshape(b, h, w, c).transpose(0, 3, 1, 2)
        if self.use_layer_scale:
            x = x + params["layer_scale_1"].astype(x.dtype) * res
            x = x + params["layer_scale_2"].astype(x.dtype) * self.linear(params["linear"], x)
        else:
            x = x + res
            x = x + self.linear(params["linear"], x)
        return x


class SwiftFormerStage(Module):
    def __init__(self, config, index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        dim = config.embed_dims[index]
        depth = config.depths[index]
        blocks = []
        for b in range(depth):
            if depth - b <= 1:
                blocks.append(SwiftFormerEncoderBlock(config, dim, **kw))
            else:
                blocks.append(SwiftFormerConvEncoder(config, dim, **kw))
        self.blocks = blocks

    def __call__(self, params, x):
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][str(i)], x)
        return x


class SwiftFormerModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embed = SwiftFormerPatchEmbedding(config, **kw)
        network = []
        for i in range(len(config.depths)):
            network.append(SwiftFormerStage(config, i, **kw))
            if i >= len(config.depths) - 1:
                break
            if config.downsamples[i] or config.embed_dims[i] != config.embed_dims[i + 1]:
                network.append(SwiftFormerEmbeddings(config, i, **kw))
        encoder = Module(**kw)
        encoder.network = network
        self.encoder = encoder

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.patch_embed(params["patch_embed"], pixel_values)
        all_hidden = [x] if output_hidden_states else None
        for i, block in enumerate(self.encoder.network):
            x = block(params["encoder"]["network"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        from ...modeling_outputs import BaseModelOutput

        return BaseModelOutput(
            last_hidden_state=x,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class SwiftFormerPreTrainedModel(PreTrainedModel):
    config_class = SwiftFormerConfig
    base_model_prefix = "swiftformer"
    main_input_name = "pixel_values"


class SwiftFormerModelStandalone(SwiftFormerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.swiftformer = SwiftFormerModel(config, dtype=self.dtype,
                                            param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.swiftformer(params["swiftformer"], pixel_values, **kwargs)


class SwiftFormerForImageClassification(SwiftFormerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.swiftformer = SwiftFormerModel(config, **kw)
        self.norm = BatchNorm(config.embed_dims[-1], config.batch_norm_eps, **kw)
        self.head = Linear(config.embed_dims[-1], config.num_labels, True,
                           kernel_init=normal_init(0.02), **kw)
        self.dist_head = Linear(config.embed_dims[-1], config.num_labels, True,
                                kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs):
        outputs = self.swiftformer(params["swiftformer"], pixel_values,
                                   output_hidden_states=output_hidden_states)
        x = self.norm(params["norm"], outputs.last_hidden_state)
        pooled = x.reshape(*x.shape[:2], -1).mean(axis=-1)
        logits = (self.head(params["head"], pooled)
                  + self.dist_head(params["dist_head"], pooled)) / 2
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import ImageClassifierOutput

        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
