"""ZoeDepth (reference models/zoedepth/modeling_zoedepth.py): metric depth
estimation — a BEiT backbone feeds a DPT-style reassemble+fusion neck, a
relative-depth head, and a metric head that refines adaptive depth bins with
attractor layers and converts per-pixel bin probabilities (conditional
log-binomial softmax) into metric depth. The multi-head variant routes between
bin configurations with a patch-transformer domain classifier."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..beit.modeling_beit import BeitEmbeddings, _BeitEncoder
from ..dpt.modeling_dpt import (
    DPTFeatureFusionStage,
    DPTReassembleLayer,
    _ReadoutProject,
    resize_bilinear,
)
from ..luke.modeling_luke import _Container
from .configuration_zoedepth import ZoeDepthConfig


@dataclass
class ZoeDepthDepthEstimatorOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    predicted_depth: Optional[jnp.ndarray] = None
    domain_logits: Optional[jnp.ndarray] = None


class ZoeDepthReassembleStage(Module):
    """Like DPTReassembleStage but takes explicit patch_height/width
    (reference ZoeDepthReassembleStage)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.readout_type = config.readout_type
        self.layers = [DPTReassembleLayer(config, ch, f, **kw)
                       for ch, f in zip(config.neck_hidden_sizes,
                                        config.reassemble_factors)]
        if config.readout_type == "project":
            self.readout_projects = [_ReadoutProject(config, **kw)
                                     for _ in config.neck_hidden_sizes]

    def __call__(self, params, hidden_states, patch_height, patch_width):
        out = []
        for i, hs in enumerate(hidden_states):
            cls_tok, hs = hs[:, 0], hs[:, 1:]
            b, n, c = hs.shape
            fmap = hs.reshape(b, patch_height, patch_width, c)
            if self.readout_type == "project":
                readout = jnp.broadcast_to(cls_tok[:, None, None, :], fmap.shape)
                fmap = self.readout_projects[i](
                    params["readout_projects"][str(i)],
                    jnp.concatenate([fmap, readout], axis=-1))
            elif self.readout_type == "add":
                fmap = fmap + cls_tok[:, None, None, :]
            fmap = fmap.transpose(0, 3, 1, 2)
            out.append(self.layers[i](params["layers"][str(i)], fmap))
        return out


class ZoeDepthNeck(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if (config.backbone_config is not None
                and config.backbone_config.model_type == "swinv2"):
            self.reassemble_stage = None
        else:
            self.reassemble_stage = ZoeDepthReassembleStage(config, **kw)
        self.convs = [Conv(ch, config.fusion_hidden_size, 3, padding=1,
                           use_bias=False, **kw)
                      for ch in config.neck_hidden_sizes]
        self.fusion_stage = DPTFeatureFusionStage(config, **kw)

    def __call__(self, params, hidden_states, patch_height, patch_width):
        if self.reassemble_stage is not None:
            hidden_states = self.reassemble_stage(
                params["reassemble_stage"], hidden_states, patch_height, patch_width)
        feats = [conv(params["convs"][str(i)], f)
                 for i, (conv, f) in enumerate(zip(self.convs, hidden_states))]
        return self.fusion_stage(params["fusion_stage"], feats), feats[-1]


class ZoeDepthRelativeDepthEstimationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.head_in_index = config.head_in_index
        f = config.fusion_hidden_size
        if config.add_projection:
            self.projection = Conv(256, 256, 3, padding=1, **kw)
        else:
            self.projection = None
        self.conv1 = Conv(f, f // 2, 3, padding=1, **kw)
        self.conv2 = Conv(f // 2, config.num_relative_features, 3, padding=1, **kw)
        self.conv3 = Conv(config.num_relative_features, 1, 1, **kw)

    def __call__(self, params, hidden_states):
        h = hidden_states[self.head_in_index]
        if self.projection is not None:
            h = jax.nn.relu(self.projection(params["projection"], h))
        h = self.conv1(params["conv1"], h)
        h = resize_bilinear(h, (h.shape[2] * 2, h.shape[3] * 2), align_corners=True)
        h = jax.nn.relu(self.conv2(params["conv2"], h))
        features = h
        h = jax.nn.relu(self.conv3(params["conv3"], h))
        return h[:, 0], features


def _log_binom(n, k, eps=1e-7):
    n = n + eps
    k = k + eps
    return n * jnp.log(n) - k * jnp.log(k) - (n - k) * jnp.log(n - k + eps)


def _log_binomial_softmax(probabilities, n_classes, temperature, eps=1e-4):
    """Reference LogBinomialSoftmax.forward (buffers k_idx / k_minus_1 are
    non-persistent, so there are no params)."""
    if probabilities.ndim == 3:
        probabilities = probabilities[:, None]
    k_idx = jnp.arange(n_classes, dtype=jnp.float32).reshape(1, -1, 1, 1)
    k_m1 = jnp.asarray(float(n_classes - 1)).reshape(1, 1, 1, 1)
    one_minus = jnp.clip(1 - probabilities, eps, 1.0)
    p = jnp.clip(probabilities, eps, 1.0)
    y = _log_binom(k_m1, k_idx) + k_idx * jnp.log(p) + (k_m1 - k_idx) * jnp.log(one_minus)
    return jax.nn.softmax(y / temperature, axis=1)


class ZoeDepthConditionalLogBinomialSoftmax(Module):
    def __init__(self, config, in_features, condition_dim, n_classes=256,
                 bottleneck_factor=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        bottleneck = (in_features + condition_dim) // bottleneck_factor
        self.mlp = _Container({
            "0": Conv(in_features + condition_dim, bottleneck, 1, **kw),
            "2": Conv(bottleneck, 4, 1, **kw),
        }, **kw)
        self.p_eps = 1e-4
        self.max_temp = config.max_temp
        self.min_temp = config.min_temp
        self.n_classes = n_classes

    def __call__(self, params, main_feature, condition_feature):
        mods = self.mlp._children
        h = jnp.concatenate([main_feature, condition_feature], axis=1)
        h = mods["0"](params["mlp"]["0"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = jax.nn.softplus(mods["2"](params["mlp"]["2"], h))
        prob, temp = h[:, :2], h[:, 2:]
        prob = prob + self.p_eps
        prob = prob[:, 0] / (prob[:, 0] + prob[:, 1])
        temp = temp + self.p_eps
        temp = (temp[:, 0] / (temp[:, 0] + temp[:, 1]))[:, None]
        temp = (self.max_temp - self.min_temp) * temp + self.min_temp
        return _log_binomial_softmax(prob, self.n_classes, temp)


class ZoeDepthSeedBinRegressor(Module):
    def __init__(self, config, n_bins=16, mlp_dim=256, min_depth=1e-3,
                 max_depth=10, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.bin_centers_type = config.bin_centers_type
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.conv1 = Conv(config.bottleneck_features, mlp_dim, 1, **kw)
        self.conv2 = Conv(mlp_dim, n_bins, 1, **kw)

    def __call__(self, params, x):
        h = jax.nn.relu(self.conv1(params["conv1"], x))
        h = self.conv2(params["conv2"], h)
        if self.bin_centers_type == "normed":
            centers = jax.nn.relu(h) + 1e-3
            widths_normed = centers / centers.sum(axis=1, keepdims=True)
            widths = (self.max_depth - self.min_depth) * widths_normed
            widths = jnp.pad(widths, ((0, 0), (1, 0), (0, 0), (0, 0)),
                             constant_values=self.min_depth)
            edges = jnp.cumsum(widths, axis=1)
            centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
            return widths_normed, centers
        centers = jax.nn.softplus(h)
        return centers, centers


def _inv_attractor(dx, alpha=300.0, gamma=2):
    # reference inv_attractor is always called with its DEFAULT alpha/gamma
    # (config.attractor_alpha is stored but unused — kept for weight compat)
    return dx / (1 + alpha * dx ** gamma)


class ZoeDepthAttractorLayer(Module):
    """Normed attractor: bins bounded to (min_depth, max_depth)."""

    def __init__(self, config, n_bins, n_attractors=16, min_depth=1e-3,
                 max_depth=10, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.kind = config.attractor_kind
        self.n_attractors = n_attractors
        self.min_depth = min_depth
        self.max_depth = max_depth
        d = config.bin_embedding_dim
        self.conv1 = Conv(d, d, 1, **kw)
        self.conv2 = Conv(d, n_attractors * 2, 1, **kw)

    def __call__(self, params, x, prev_bin, prev_bin_embedding=None,
                 interpolate=True):
        if prev_bin_embedding is not None:
            if interpolate:
                prev_bin_embedding = resize_bilinear(
                    prev_bin_embedding, x.shape[-2:], align_corners=True)
            x = x + prev_bin_embedding
        h = jax.nn.relu(self.conv1(params["conv1"], x))
        attractors = jax.nn.relu(self.conv2(params["conv2"], h)) + 1e-3
        b, _, hh, ww = attractors.shape
        attractors = attractors.reshape(b, self.n_attractors, 2, hh, ww)
        attractors_normed = attractors[:, :, 0]
        bin_centers = resize_bilinear(prev_bin, (hh, ww), align_corners=True)
        delta = _inv_attractor(attractors_normed[:, :, None] - bin_centers[:, None])
        delta = delta.mean(axis=1) if self.kind == "mean" else delta.sum(axis=1)
        bin_new = bin_centers + delta
        centers = (self.max_depth - self.min_depth) * bin_new + self.min_depth
        centers = jnp.clip(jnp.sort(centers, axis=1), self.min_depth, self.max_depth)
        return bin_new, centers


class ZoeDepthAttractorLayerUnnormed(Module):
    """Softplus attractor: unbounded bin centers."""

    def __init__(self, config, n_bins, n_attractors=16, min_depth=1e-3,
                 max_depth=10, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.kind = config.attractor_kind
        self.n_attractors = n_attractors
        d = config.bin_embedding_dim
        self.conv1 = Conv(d, d, 1, **kw)
        self.conv2 = Conv(d, n_attractors, 1, **kw)

    def __call__(self, params, x, prev_bin, prev_bin_embedding=None,
                 interpolate=True):
        if prev_bin_embedding is not None:
            if interpolate:
                prev_bin_embedding = resize_bilinear(
                    prev_bin_embedding, x.shape[-2:], align_corners=True)
            x = x + prev_bin_embedding
        h = jax.nn.relu(self.conv1(params["conv1"], x))
        attractors = jax.nn.softplus(self.conv2(params["conv2"], h))
        hh, ww = attractors.shape[-2:]
        bin_centers = resize_bilinear(prev_bin, (hh, ww), align_corners=True)
        delta = _inv_attractor(attractors[:, :, None] - bin_centers[:, None])
        delta = delta.mean(axis=1) if self.kind == "mean" else delta.sum(axis=1)
        bin_new = bin_centers + delta
        return bin_new, bin_new


class ZoeDepthProjector(Module):
    def __init__(self, in_features, out_features, mlp_dim=128, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = Conv(in_features, mlp_dim, 1, **kw)
        self.conv2 = Conv(mlp_dim, out_features, 1, **kw)

    def __call__(self, params, x):
        return self.conv2(params["conv2"],
                          jax.nn.relu(self.conv1(params["conv1"], x)))


class ZoeDepthMultiheadAttention(Module):
    def __init__(self, hidden_size, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.query = Linear(hidden_size, hidden_size, True, **kw)
        self.key = Linear(hidden_size, hidden_size, True, **kw)
        self.value = Linear(hidden_size, hidden_size, True, **kw)
        self.out_proj = Linear(hidden_size, hidden_size, True, **kw)

    def __call__(self, params, queries, keys, values):
        b, s, _ = queries.shape
        q = self.query(params["query"], queries).reshape(b, -1, self.num_heads, self.head_dim)
        k = self.key(params["key"], keys).reshape(b, -1, self.num_heads, self.head_dim)
        v = self.value(params["value"], values).reshape(b, -1, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / (self.head_dim ** 0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.out_proj(params["out_proj"], out)


class ZoeDepthTransformerEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        h = config.patch_transformer_hidden_size
        inter = config.patch_transformer_intermediate_size
        self.self_attn = ZoeDepthMultiheadAttention(
            h, config.patch_transformer_num_attention_heads, **kw)
        self.linear1 = Linear(h, inter, True, **lkw)
        self.linear2 = Linear(inter, h, True, **lkw)
        self.norm1 = LayerNorm(h, 1e-5, **kw)
        self.norm2 = LayerNorm(h, 1e-5, **kw)

    def __call__(self, params, src):
        attn = self.self_attn(params["self_attn"], src, src, src)
        src = self.norm1(params["norm1"], src + attn)
        h = self.linear2(params["linear2"],
                         jax.nn.relu(self.linear1(params["linear1"], src)))
        return self.norm2(params["norm2"], src + h)


class ZoeDepthPatchTransformerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.transformer_encoder = [
            ZoeDepthTransformerEncoderLayer(config, **kw)
            for _ in range(config.num_patch_transformer_layers)]
        self.embedding_convPxP = Conv(config.bottleneck_features,
                                      config.patch_transformer_hidden_size, 1, **kw)

    @staticmethod
    def _pos_encoding_1d(seq_len, dim):
        position = np.arange(seq_len, dtype=np.float32)[:, None]
        index = np.arange(0, dim, 2, dtype=np.float32)[None, :]
        div_term = np.exp(index * (-np.log(10000.0) / dim))
        pe = position * div_term
        return jnp.asarray(np.concatenate([np.sin(pe), np.cos(pe)], axis=1))

    def __call__(self, params, x):
        emb = self.embedding_convPxP(params["embedding_convPxP"], x)
        b, c, h, w = emb.shape
        emb = emb.reshape(b, c, h * w)
        emb = jnp.pad(emb, ((0, 0), (0, 0), (1, 0)))  # CLS slot at the front
        emb = emb.transpose(0, 2, 1)
        emb = emb + self._pos_encoding_1d(emb.shape[1], emb.shape[2])[None].astype(emb.dtype)
        for i in range(4):  # reference iterates exactly 4 layers
            emb = self.transformer_encoder[i](
                params["transformer_encoder"][str(i)], emb)
        return emb


class ZoeDepthMLPClassifier(Module):
    def __init__(self, in_features, out_features, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.linear1 = Linear(in_features, in_features, True, **kw)
        self.linear2 = Linear(in_features, out_features, True, **kw)

    def __call__(self, params, h):
        return self.linear2(params["linear2"],
                            jax.nn.relu(self.linear1(params["linear1"], h)))


def _attractor_cls(config):
    return (ZoeDepthAttractorLayer if config.bin_centers_type == "normed"
            else ZoeDepthAttractorLayerUnnormed)


class ZoeDepthMetricDepthEstimationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        conf = config.bin_configurations[0]
        self.min_depth = conf["min_depth"]
        self.max_depth = conf["max_depth"]
        self.bin_centers_type = config.bin_centers_type
        bf = config.bottleneck_features
        self.conv2 = Conv(bf, bf, 1, **kw)
        attractor = _attractor_cls(config)
        self.seed_bin_regressor = ZoeDepthSeedBinRegressor(
            config, n_bins=conf["n_bins"], min_depth=self.min_depth,
            max_depth=self.max_depth, **kw)
        self.seed_projector = ZoeDepthProjector(bf, config.bin_embedding_dim, **kw)
        self.projectors = [ZoeDepthProjector(config.fusion_hidden_size,
                                             config.bin_embedding_dim, **kw)
                           for _ in range(4)]
        self.attractors = [attractor(config, n_bins=conf["n_bins"],
                                     n_attractors=config.num_attractors[i],
                                     min_depth=self.min_depth,
                                     max_depth=self.max_depth, **kw)
                           for i in range(4)]
        self.conditional_log_binomial = ZoeDepthConditionalLogBinomialSoftmax(
            config, config.num_relative_features + 1, config.bin_embedding_dim,
            n_classes=conf["n_bins"], **kw)

    def __call__(self, params, outconv_activation, bottleneck, feature_blocks,
                 relative_depth):
        x = self.conv2(params["conv2"], bottleneck)
        _, seed_bin_centers = self.seed_bin_regressor(
            params["seed_bin_regressor"], x)
        if self.bin_centers_type in ("normed", "hybrid2"):
            prev_bin = (seed_bin_centers - self.min_depth) / (self.max_depth - self.min_depth)
        else:
            prev_bin = seed_bin_centers
        prev_bin_embedding = self.seed_projector(params["seed_projector"], x)
        bin_embedding = bin_centers = None
        for i, (proj, attractor, feature) in enumerate(
                zip(self.projectors, self.attractors, feature_blocks)):
            bin_embedding = proj(params["projectors"][str(i)], feature)
            bins, bin_centers = attractor(params["attractors"][str(i)],
                                          bin_embedding, prev_bin,
                                          prev_bin_embedding, interpolate=True)
            prev_bin = bins
            prev_bin_embedding = bin_embedding
        last = outconv_activation
        rel = resize_bilinear(relative_depth[:, None], last.shape[2:],
                              align_corners=True)
        last = jnp.concatenate([last, rel], axis=1)
        bin_embedding = resize_bilinear(bin_embedding, last.shape[-2:],
                                        align_corners=True)
        x = self.conditional_log_binomial(params["conditional_log_binomial"],
                                          last, bin_embedding)
        bin_centers = resize_bilinear(bin_centers, x.shape[-2:], align_corners=True)
        return (x * bin_centers).sum(axis=1, keepdims=True), None


class ZoeDepthMultipleMetricDepthEstimationHeads(Module):
    """Routes between per-domain bin heads with a patch-transformer
    classifier (reference ZoeDepthMultipleMetricDepthEstimationHeads). The
    route is a host-side argmax, as in the reference."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.bin_configurations = config.bin_configurations
        self.bin_centers_type = config.bin_centers_type
        bf = config.bottleneck_features
        d = config.bin_embedding_dim
        self.conv2 = Conv(bf, bf, 1, **kw)
        self.patch_transformer = ZoeDepthPatchTransformerEncoder(config, **kw)
        self.mlp_classifier = ZoeDepthMLPClassifier(128, 2, **kw)
        attractor = _attractor_cls(config)
        self.seed_bin_regressors = _Container({
            conf["name"]: ZoeDepthSeedBinRegressor(
                config, n_bins=conf["n_bins"], mlp_dim=d // 2,
                min_depth=conf["min_depth"], max_depth=conf["max_depth"], **kw)
            for conf in config.bin_configurations}, **kw)
        self.seed_projector = ZoeDepthProjector(bf, d, mlp_dim=d // 2, **kw)
        self.projectors = [ZoeDepthProjector(config.fusion_hidden_size, d,
                                             mlp_dim=d // 2, **kw)
                           for _ in range(4)]
        # reference quirk kept for weight compat: n_bins is set from
        # num_attractors[i] and every layer keeps the default 16 attractors
        self.attractors = _Container({
            conf["name"]: _Container({
                str(i): attractor(config, n_bins=config.num_attractors[i],
                                  min_depth=conf["min_depth"],
                                  max_depth=conf["max_depth"], **kw)
                for i in range(len(config.num_attractors))}, **kw)
            for conf in config.bin_configurations}, **kw)
        self.conditional_log_binomial = _Container({
            conf["name"]: ZoeDepthConditionalLogBinomialSoftmax(
                config, config.num_relative_features, d,
                n_classes=conf["n_bins"], bottleneck_factor=4, **kw)
            for conf in config.bin_configurations}, **kw)

    def __call__(self, params, outconv_activation, bottleneck, feature_blocks,
                 relative_depth):
        x = self.conv2(params["conv2"], bottleneck)
        embedding = self.patch_transformer(params["patch_transformer"], x)[:, 0]
        domain_logits = self.mlp_classifier(params["mlp_classifier"], embedding)
        vote = jax.nn.softmax(domain_logits.sum(axis=0), axis=-1)
        names = [c["name"] for c in self.bin_configurations]
        name = names[int(np.argmax(np.asarray(vote)))]
        conf = next(c for c in self.bin_configurations if c["name"] == name)
        regressor = self.seed_bin_regressors._children[name]
        _, seed_bin_centers = regressor(params["seed_bin_regressors"][name], x)
        if self.bin_centers_type in ("normed", "hybrid2"):
            prev_bin = (seed_bin_centers - conf["min_depth"]) / (
                conf["max_depth"] - conf["min_depth"])
        else:
            prev_bin = seed_bin_centers
        prev_bin_embedding = self.seed_projector(params["seed_projector"], x)
        attractors = self.attractors._children[name]
        bin_embedding = bin_centers = None
        for i, (proj, feature) in enumerate(zip(self.projectors, feature_blocks)):
            bin_embedding = proj(params["projectors"][str(i)], feature)
            attractor = attractors._children[str(i)]
            bins, bin_centers = attractor(params["attractors"][name][str(i)],
                                          bin_embedding, prev_bin,
                                          prev_bin_embedding, interpolate=True)
            prev_bin = bins
            prev_bin_embedding = bin_embedding
        last = outconv_activation
        bin_centers = resize_bilinear(bin_centers, last.shape[-2:],
                                      align_corners=True)
        bin_embedding = resize_bilinear(bin_embedding, last.shape[-2:],
                                        align_corners=True)
        clb = self.conditional_log_binomial._children[name]
        x = clb(params["conditional_log_binomial"][name], last, bin_embedding)
        return (x * bin_centers).sum(axis=1, keepdims=True), domain_logits


class _BeitBackbone(Module):
    """BeitBackbone analog with reshape_hidden_states=False: sequence-form
    feature maps incl. CLS (reference BeitBackbone; embeddings/encoder sit
    directly under the ``backbone.`` prefix)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = BeitEmbeddings(config, **kw)
        self.encoder = _BeitEncoder(config, **kw)
        self.stage_names = ["stem"] + [f"stage{i}" for i in
                                       range(1, config.num_hidden_layers + 1)]
        self.out_features = config.out_features

    def __call__(self, params, pixel_values):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        _, all_hidden = self.encoder(params["encoder"], hidden,
                                     output_hidden_states=True)
        feats = []
        for name, hs in zip(self.stage_names, all_hidden):
            if name in self.out_features:
                feats.append(hs)
        return feats


class ZoeDepthPreTrainedModel(PreTrainedModel):
    config_class = ZoeDepthConfig
    base_model_prefix = "zoedepth"
    main_input_name = "pixel_values"


class ZoeDepthForDepthEstimation(ZoeDepthPreTrainedModel):
    def __init__(self, config: ZoeDepthConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = _BeitBackbone(config.backbone_config, **kw)
        self.patch_size = config.backbone_config.patch_size
        self.neck = ZoeDepthNeck(config, **kw)
        self.relative_head = ZoeDepthRelativeDepthEstimationHead(config, **kw)
        self.metric_head = (
            ZoeDepthMultipleMetricDepthEstimationHeads(config, **kw)
            if len(config.bin_configurations) > 1
            else ZoeDepthMetricDepthEstimationHead(config, **kw))

    def __call__(self, params, pixel_values=None, labels=None,
                 **kwargs) -> ZoeDepthDepthEstimatorOutput:
        if labels is not None:
            raise NotImplementedError("Training is not implemented yet")
        px = jnp.asarray(pixel_values, self.dtype)
        hidden_states = self.backbone(params["backbone"], px)
        ph = px.shape[2] // self.patch_size
        pw = px.shape[3] // self.patch_size
        fused, bottleneck = self.neck(params["neck"], hidden_states, ph, pw)
        relative_depth, features = self.relative_head(params["relative_head"], fused)
        metric_depth, domain_logits = self.metric_head(
            params["metric_head"], outconv_activation=features,
            bottleneck=bottleneck, feature_blocks=fused,
            relative_depth=relative_depth)
        return ZoeDepthDepthEstimatorOutput(predicted_depth=metric_depth[:, 0],
                                            domain_logits=domain_logits)
