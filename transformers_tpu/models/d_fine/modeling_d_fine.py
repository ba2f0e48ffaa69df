"""D-FINE (reference models/d_fine/modular_d_fine.py): RT-DETR with
Fine-grained Distribution Refinement — each decoder layer predicts discrete
edge-distance distributions (corners) integrated against a non-uniform
weighting function, refines the boxes via distance2bbox, gates the cross
-attention residual, and re-ranks scores with a location-quality estimator."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import BatchNorm, Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.deformable import multi_scale_deformable_attention_v2
from ..hgnet_v2.modeling_hgnet_v2 import HGNetV2Backbone
from ..rt_detr.modeling_rt_detr import (
    RTDetrAIFILayer,
    RTDetrMLP,
    RTDetrConvNormLayer,
    RTDetrForObjectDetection,
    RTDetrHybridEncoder,
    RTDetrMLPPredictionHead,
    RTDetrModel,
    RTDetrModelOutput,
    RTDetrObjectDetectionOutput,
    RTDetrPreTrainedModel,
    RTDetrRepVggBlock,
    RTDetrSelfAttention,
    _RTDetrCore,
    _Seq2,
    inverse_sigmoid,
)
from .configuration_d_fine import DFineConfig


class DFineConvNormLayer(RTDetrConvNormLayer):
    def __init__(self, config, in_ch, out_ch, kernel_size, stride, groups=1,
                 padding=None, activation=None, *, dtype, param_dtype):
        super().__init__(config, in_ch, out_ch, kernel_size, stride,
                         padding=padding, activation=activation,
                         dtype=dtype, param_dtype=param_dtype)
        if groups != 1:
            kw = dict(dtype=dtype, param_dtype=param_dtype)
            self.conv = Conv(in_ch, out_ch, kernel_size, stride=stride,
                             padding=(kernel_size - 1) // 2 if padding is None
                             else padding,
                             use_bias=False, groups=groups, ndim=2, **kw)


class DFineRepVggBlock(Module):
    def __init__(self, config, cin, cout, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        act = config.activation_function
        self.conv1 = DFineConvNormLayer(config, cin, cout, 3, 1, padding=1, **kw)
        self.conv2 = DFineConvNormLayer(config, cin, cout, 1, 1, padding=0, **kw)
        self.act = get_activation(act)

    def __call__(self, params, x):
        return self.act(self.conv1(params["conv1"], x)
                        + self.conv2(params["conv2"], x))


class DFineCSPRepLayer(Module):
    def __init__(self, config, cin, cout, num_blocks, expansion=1.0,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        act = config.activation_function
        hidden = int(cout * expansion)
        self.conv1 = DFineConvNormLayer(config, cin, hidden, 1, 1, activation=act, **kw)
        self.conv2 = DFineConvNormLayer(config, cin, hidden, 1, 1, activation=act, **kw)
        self.bottlenecks = [DFineRepVggBlock(config, hidden, hidden, **kw)
                            for _ in range(num_blocks)]
        self.conv3 = (DFineConvNormLayer(config, hidden, cout, 1, 1,
                                         activation=act, **kw)
                      if hidden != cout else None)

    def __call__(self, params, x):
        h1 = self.conv1(params["conv1"], x)
        for i, blk in enumerate(self.bottlenecks):
            h1 = blk(params["bottlenecks"][str(i)], h1)
        h2 = self.conv2(params["conv2"], x)
        out = h1 + h2
        if self.conv3 is not None:
            out = self.conv3(params["conv3"], out)
        return out


class DFineRepNCSPELAN4(Module):
    def __init__(self, config, numb_blocks, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        act = "silu"
        c1 = config.encoder_hidden_dim * 2
        c2 = config.encoder_hidden_dim
        c3 = config.encoder_hidden_dim * 2
        c4 = round(config.hidden_expansion * config.encoder_hidden_dim // 2)
        self.conv_dim = c3 // 2
        self.conv1 = DFineConvNormLayer(config, c1, c3, 1, 1, activation=act, **kw)
        self.csp_rep1 = DFineCSPRepLayer(config, c3 // 2, c4,
                                         num_blocks=numb_blocks, **kw)
        self.conv2 = DFineConvNormLayer(config, c4, c4, 3, 1, activation=act, **kw)
        self.csp_rep2 = DFineCSPRepLayer(config, c4, c4,
                                         num_blocks=numb_blocks, **kw)
        self.conv3 = DFineConvNormLayer(config, c4, c4, 3, 1, activation=act, **kw)
        self.conv4 = DFineConvNormLayer(config, c3 + 2 * c4, c2, 1, 1,
                                        activation=act, **kw)

    def __call__(self, params, x):
        h = self.conv1(params["conv1"], x)
        split = [h[:, :self.conv_dim], h[:, self.conv_dim:]]
        b1 = self.csp_rep1(params["csp_rep1"], split[-1])
        b1 = self.conv2(params["conv2"], b1)
        b2 = self.csp_rep2(params["csp_rep2"], b1)
        b2 = self.conv3(params["conv3"], b2)
        merged = jnp.concatenate(split + [b1, b2], axis=1)
        return self.conv4(params["conv4"], merged)


class DFineSCDown(Module):
    def __init__(self, config, kernel_size, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.encoder_hidden_dim
        self.conv1 = DFineConvNormLayer(config, d, d, 1, 1, **kw)
        self.conv2 = DFineConvNormLayer(config, d, d, kernel_size, stride,
                                        groups=d, **kw)

    def __call__(self, params, x):
        return self.conv2(params["conv2"], self.conv1(params["conv1"], x))


class DFineHybridEncoder(RTDetrHybridEncoder):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        n = len(config.encoder_in_channels)
        num_blocks = round(3 * config.depth_mult)
        self.aifi = [RTDetrAIFILayer(config, **kw)
                     for _ in range(len(config.encode_proj_layers))]
        self.lateral_convs = [DFineConvNormLayer(
            config, config.encoder_hidden_dim, config.encoder_hidden_dim, 1, 1, **kw)
            for _ in range(n - 1)]
        self.fpn_blocks = [DFineRepNCSPELAN4(config, num_blocks, **kw)
                           for _ in range(n - 1)]
        self.downsample_convs = [DFineSCDown(config, 3, 2, **kw)
                                 for _ in range(n - 1)]
        self.pan_blocks = [DFineRepNCSPELAN4(config, num_blocks, **kw)
                           for _ in range(n - 1)]


class DFineMultiscaleDeformableAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.d_model = d
        self.n_heads = config.decoder_attention_heads
        self.n_levels = config.num_feature_levels
        self.offset_scale = config.decoder_offset_scale
        self.method = config.decoder_method
        n_points = config.decoder_n_points
        self.num_points_list = (list(n_points) if isinstance(n_points, (list, tuple))
                                else [n_points] * self.n_levels)
        scale = [1.0 / n for n in self.num_points_list for _ in range(n)]
        self.num_points_scale = np.asarray(scale, np.float32)
        total = self.n_heads * sum(self.num_points_list)
        self.sampling_offsets = Linear(d, total * 2, **kw)
        self.attention_weights = Linear(d, total, **kw)

    def __call__(self, params, hidden, encoder_hidden, reference_points,
                 spatial_shapes):
        b, q, _ = hidden.shape
        s = encoder_hidden.shape[1]
        value = encoder_hidden.reshape(b, s, self.n_heads,
                                       self.d_model // self.n_heads)
        total_pts = sum(self.num_points_list)
        offsets = self.sampling_offsets(params["sampling_offsets"], hidden)
        offsets = offsets.reshape(b, q, self.n_heads, total_pts, 2)
        weights = self.attention_weights(params["attention_weights"], hidden)
        weights = weights.reshape(b, q, self.n_heads, total_pts)
        weights = jax.nn.softmax(weights, -1)
        nps = jnp.asarray(self.num_points_scale)[None, None, None, :, None]
        offset = (offsets * nps * reference_points[:, :, None, :, 2:]
                  * self.offset_scale)
        locations = reference_points[:, :, None, :, :2] + offset
        out = multi_scale_deformable_attention_v2(
            value, spatial_shapes, locations, weights, self.num_points_list,
            self.method)
        return out


class DFineGate(Module):
    def __init__(self, d, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.gate = Linear(2 * d, 2 * d, **kw)
        self.norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, second_residual, hidden):
        gates = jax.nn.sigmoid(self.gate(
            params["gate"], jnp.concatenate([second_residual, hidden], -1)))
        g1, g2 = jnp.split(gates, 2, axis=-1)
        return self.norm(params["norm"], g1 * second_residual + g2 * hidden)


class DFineMLP(Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers,
                 act="relu", *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        dims_in = [input_dim] + [hidden_dim] * (num_layers - 1)
        dims_out = [hidden_dim] * (num_layers - 1) + [output_dim]
        self.layers = [Linear(i, o, dtype=dtype, param_dtype=param_dtype)
                       for i, o in zip(dims_in, dims_out)]
        self.act = get_activation(act)

    def __call__(self, params, x):
        n = len(self.layers)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
            if i < n - 1:
                x = self.act(x)
        return x


class DFineLQE(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.k = config.top_prob_values
        self.max_num_bins = config.max_num_bins
        self.reg_conf = DFineMLP(4 * (self.k + 1), config.lqe_hidden_dim, 1,
                                 config.lqe_layers, dtype=dtype,
                                 param_dtype=param_dtype)

    def __call__(self, params, scores, pred_corners):
        b, s, _ = pred_corners.shape
        prob = jax.nn.softmax(
            pred_corners.reshape(b, s, 4, self.max_num_bins + 1), axis=-1)
        topk = jax.lax.top_k(prob, self.k)[0]
        stat = jnp.concatenate([topk, topk.mean(-1, keepdims=True)], -1)
        quality = self.reg_conf(params["reg_conf"], stat.reshape(b, s, -1))
        return scores + quality


class DFineDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = RTDetrSelfAttention(config, d,
                                             config.decoder_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.encoder_attn = DFineMultiscaleDeformableAttention(config, **kw)
        self.gateway = DFineGate(d, **kw)
        # hub layout stores this MLP as fc1/fc2 (renamed to mlp.* by the
        # shared rt_detr weight rules)
        self.mlp = RTDetrMLP(config, d, config.decoder_ffn_dim,
                             config.decoder_activation_function, **kw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, query_pos, reference_points,
                 spatial_shapes, encoder_hidden):
        residual = hidden
        h = self.self_attn(params["self_attn"], hidden, query_pos)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"],
                                           residual + h)
        residual = hidden
        h = hidden + query_pos if query_pos is not None else hidden
        h = self.encoder_attn(params["encoder_attn"], h, encoder_hidden,
                              reference_points, spatial_shapes)
        hidden = self.gateway(params["gateway"], residual, h)
        residual = hidden
        h = self.mlp(params["mlp"], hidden)
        hidden = residual + h
        return self.final_layer_norm(params["final_layer_norm"],
                                     jnp.clip(hidden, -65504, 65504))


def weighting_function(max_num_bins, up, reg_scale):
    ub1 = abs(up) * abs(reg_scale)
    ub2 = abs(up) * abs(reg_scale) * 2
    step = (ub1 + 1) ** (2 / (max_num_bins - 2))
    left = [-(step ** i) + 1 for i in range(max_num_bins // 2 - 1, 0, -1)]
    right = [step ** i - 1 for i in range(1, max_num_bins // 2)]
    values = [-ub2] + left + [0.0] + right + [ub2]
    return jnp.asarray(np.asarray(values, np.float32))


def distance2bbox(points, distance, reg_scale):
    reg_scale = abs(reg_scale)
    tlx = points[..., 0] - (0.5 * reg_scale + distance[..., 0]) * (points[..., 2] / reg_scale)
    tly = points[..., 1] - (0.5 * reg_scale + distance[..., 1]) * (points[..., 3] / reg_scale)
    brx = points[..., 0] + (0.5 * reg_scale + distance[..., 2]) * (points[..., 2] / reg_scale)
    bry = points[..., 1] + (0.5 * reg_scale + distance[..., 3]) * (points[..., 3] / reg_scale)
    cx = (tlx + brx) / 2
    cy = (tly + bry) / 2
    w = brx - tlx
    h = bry - tly
    return jnp.stack([cx, cy, w, h], -1)


class DFineIntegral(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.max_num_bins = config.max_num_bins

    def __call__(self, params, pred_corners, project):
        b, q, _ = pred_corners.shape
        p = jax.nn.softmax(pred_corners.reshape(-1, self.max_num_bins + 1), -1)
        out = p @ project
        return out.reshape(b, q, -1)


class DFineDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.eval_idx = (config.eval_idx if config.eval_idx >= 0
                         else config.decoder_layers + config.eval_idx)
        n_layers = config.decoder_layers + (config.decoder_layers
                                            - self.eval_idx - 1)
        self.layers = [DFineDecoderLayer(config, **kw) for _ in range(n_layers)]
        self.query_pos_head = RTDetrMLPPredictionHead(4, 2 * config.d_model,
                                                      config.d_model, 2, **kw)
        self.pre_bbox_head = DFineMLP(config.d_model, config.d_model, 4, 3, **kw)
        self.integral = DFineIntegral(config, **kw)
        self.lqe_layers = [DFineLQE(config, **kw)
                           for _ in range(config.decoder_layers)]
        scaled = round(config.layer_scale * config.d_model)
        self.class_embed = [Linear(config.d_model, config.num_labels, **kw)
                            for _ in range(config.decoder_layers)]
        self.bbox_embed = (
            [DFineMLP(config.d_model, config.d_model,
                      4 * (config.max_num_bins + 1), 3, **kw)
             for _ in range(self.eval_idx + 1)]
            + [DFineMLP(scaled, scaled, 4 * (config.max_num_bins + 1), 3, **kw)
               for _ in range(config.decoder_layers - self.eval_idx - 1)])

    def init(self, rng):
        params = super().init(rng)
        params["reg_scale"] = jnp.asarray([self.config.reg_scale],
                                          self.param_dtype)
        params["up"] = jnp.asarray([self.config.up], self.param_dtype)
        return params

    def __call__(self, params, target, encoder_hidden, reference_points_unact,
                 spatial_shapes):
        cfg = self.config
        hidden = target
        # reg_scale/up live in the checkpoint (frozen params), not the config
        reg_scale = float(np.asarray(params["reg_scale"])[0])
        up = float(np.asarray(params["up"])[0])
        project = weighting_function(cfg.max_num_bins, up, reg_scale)
        ref_points = jax.nn.sigmoid(reference_points_unact)
        intermediate, inter_logits, inter_refs = [], [], []
        output_detach = 0.0
        pred_corners_undetach = 0.0
        ref_points_initial = None
        inter_ref_bbox = None
        for i, layer in enumerate(self.layers):
            ref_input = ref_points[:, :, None]
            query_pos = jnp.clip(
                self.query_pos_head(params["query_pos_head"], ref_points),
                -10, 10)
            hidden = layer(params["layers"][str(i)], hidden, query_pos,
                           ref_input, spatial_shapes, encoder_hidden)
            if i == 0:
                new_ref = jax.nn.sigmoid(
                    self.pre_bbox_head(params["pre_bbox_head"], hidden)
                    + inverse_sigmoid(ref_points))
                ref_points_initial = new_ref
            pred_corners = self.bbox_embed[i](params["bbox_embed"][str(i)],
                                              hidden + output_detach) \
                + pred_corners_undetach
            inter_ref_bbox = distance2bbox(
                ref_points_initial,
                self.integral(None, pred_corners, project), reg_scale)
            pred_corners_undetach = pred_corners
            ref_points = inter_ref_bbox
            output_detach = hidden
            intermediate.append(hidden)
            if i == self.eval_idx:
                scores = self.class_embed[i](params["class_embed"][str(i)],
                                             hidden)
                if i == 0:
                    inter_logits.append(scores)
                    inter_refs.append(new_ref)
                scores = self.lqe_layers[i](params["lqe_layers"][str(i)],
                                            scores, pred_corners)
                inter_logits.append(scores)
                inter_refs.append(inter_ref_bbox)
        return (hidden, jnp.stack(intermediate, 1), jnp.stack(inter_refs, 1),
                jnp.stack(inter_logits, 1))


class _DFineCore(_RTDetrCore):
    def __init__(self, config, with_heads=True, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.backbone = _HGNetBackboneWrap(config.backbone_config, **kw)
        self.encoder_input_proj = [
            _Seq2(Conv(ch, config.encoder_hidden_dim, 1, use_bias=False, ndim=2, **kw),
                  BatchNorm(config.encoder_hidden_dim, **kw), **kw)
            for ch in config.encoder_in_channels]
        self.encoder = DFineHybridEncoder(config, **kw)
        if config.num_denoising > 0:
            self.denoising_class_embed = Embedding(
                config.num_labels + 1, config.d_model,
                embedding_init=normal_init(0.02), **kw)
        if config.learn_initial_query:
            self.weight_embedding = Embedding(config.num_queries, config.d_model,
                                              embedding_init=normal_init(0.02), **kw)
        self.enc_output = _Seq2(Linear(config.d_model, config.d_model, **kw),
                                LayerNorm(config.d_model, config.layer_norm_eps, **kw),
                                **kw)
        self.enc_score_head = Linear(config.d_model, config.num_labels, **kw)
        self.enc_bbox_head = RTDetrMLPPredictionHead(config.d_model, config.d_model,
                                                     4, 3, **kw)
        # identity projections when hidden matches the decoder channels
        if config.d_model != config.decoder_in_channels[-1]:
            projs = []
            in_ch = config.decoder_in_channels[-1]
            for _ in range(len(config.decoder_in_channels)):
                projs.append(_Seq2(
                    Conv(in_ch, config.d_model, 1, use_bias=False, ndim=2, **kw),
                    BatchNorm(config.d_model, config.batch_norm_eps, **kw), **kw))
            for _ in range(config.num_feature_levels - len(config.decoder_in_channels)):
                projs.append(_Seq2(
                    Conv(in_ch, config.d_model, 3, stride=2, padding=1,
                         use_bias=False, ndim=2, **kw),
                    BatchNorm(config.d_model, config.batch_norm_eps, **kw), **kw))
            self.decoder_input_proj = projs
        else:
            self.decoder_input_proj = None
        self.decoder = DFineDecoder(config, **kw)

    def __call__(self, params, pixel_values):
        features = self.backbone.model(params["backbone"]["model"], pixel_values)
        proj_feats = [self.encoder_input_proj[i](
            params["encoder_input_proj"][str(i)], f)
            for i, f in enumerate(features)]
        pan = self.encoder(params["encoder"], proj_feats)
        if self.decoder_input_proj is not None:
            sources = [self.decoder_input_proj[i](
                params["decoder_input_proj"][str(i)], s)
                for i, s in enumerate(pan)]
        else:
            sources = list(pan)
        spatial_shapes = [(s.shape[2], s.shape[3]) for s in sources]
        flat = jnp.concatenate(
            [jnp.swapaxes(s.reshape(s.shape[0], s.shape[1], -1), 1, 2)
             for s in sources], axis=1)
        anchors, valid_mask = self.generate_anchors(spatial_shapes)
        memory = valid_mask.astype(flat.dtype) * flat
        output_memory = self.enc_output(params["enc_output"], memory)
        enc_class = self.enc_score_head(params["enc_score_head"], output_memory)
        enc_coord = self.enc_bbox_head(params["enc_bbox_head"], output_memory) + anchors
        topk = self.config.num_queries
        _, topk_ind = jax.lax.top_k(jnp.max(enc_class, -1), topk)
        gather = lambda x: jnp.take_along_axis(
            x, topk_ind[..., None].repeat(x.shape[-1], -1), axis=1)
        reference_points_unact = gather(enc_coord)
        enc_topk_bboxes = jax.nn.sigmoid(reference_points_unact)
        enc_topk_logits = gather(enc_class)
        if self.config.learn_initial_query:
            target = jnp.tile(params["weight_embedding"]["weight"][None]
                              .astype(flat.dtype), (flat.shape[0], 1, 1))
        else:
            target = jax.lax.stop_gradient(gather(output_memory))
        out = self.decoder(params["decoder"], target, flat,
                           jax.lax.stop_gradient(reference_points_unact),
                           spatial_shapes)
        last, intermediate, inter_refs, inter_logits = out
        return RTDetrModelOutput(
            last_hidden_state=last,
            intermediate_hidden_states=intermediate,
            intermediate_logits=inter_logits,
            intermediate_reference_points=inter_refs,
            enc_topk_logits=enc_topk_logits,
            enc_topk_bboxes=enc_topk_bboxes)


class _HGNetBackboneWrap(Module):
    def __init__(self, backbone_config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.model = _HGNetBackbone(backbone_config, dtype=dtype,
                                    param_dtype=param_dtype)


class _HGNetBackbone(Module):
    """HGNetV2Backbone as a child module returning out_indices features."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ..hgnet_v2.modeling_hgnet_v2 import HGNetV2Embeddings, HGNetV2Encoder

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embedder = HGNetV2Embeddings(config, **kw)
        self.encoder = HGNetV2Encoder(config, **kw)

    def __call__(self, params, pixel_values):
        x = self.embedder(params["embedder"], pixel_values)
        _, all_hidden = self.encoder(params["encoder"], x,
                                     output_hidden_states=True)
        out_indices = getattr(self.config, "out_indices", None) or [
            len(all_hidden) - 1]
        return [all_hidden[i] for i in out_indices]


class DFinePreTrainedModel(RTDetrPreTrainedModel):
    config_class = DFineConfig
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",
                                          r"num_points_scale$")


class DFineModel(DFinePreTrainedModel):
    def __init__(self, config: DFineConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _DFineCore(config, dtype=self.dtype, param_dtype=self.param_dtype)
        for name, child in core.children.items():
            setattr(self, name, child)
        object.__setattr__(self, "_core", core)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        if labels is not None:
            raise NotImplementedError("D-FINE training loss not wired yet")
        return self._core(params, pixel_values)


class DFineForObjectDetection(DFinePreTrainedModel):
    def __init__(self, config: DFineConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = _DFineCore(config, dtype=self.dtype,
                                param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        if labels is not None:
            raise NotImplementedError("D-FINE training loss not wired yet")
        out = self.model(params["model"], pixel_values)
        logits = out.intermediate_logits[:, -1]
        pred_boxes = out.intermediate_reference_points[:, -1]
        return RTDetrObjectDetectionOutput(
            logits=logits, pred_boxes=pred_boxes,
            last_hidden_state=out.last_hidden_state,
            enc_topk_logits=out.enc_topk_logits,
            enc_topk_bboxes=out.enc_topk_bboxes)
