"""Multi-scale deformable attention (Deformable DETR family), TPU-native.

Replaces the reference's CUDA `MultiScaleDeformableAttention` kernel and its
grid_sample fallback (reference models/rt_detr/modeling_rt_detr.py:569) with a
gather-based bilinear sampler: each (query, head, level, point) samples one
bilinear-interpolated value vector, weighted-summed by the attention weights.
On TPU the gathers lower to dynamic-slice batches and the weighted reduce is
one einsum on the MXU; all shapes are static so XLA fuses the whole op.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(value, grid):
    """torch.nn.functional.grid_sample(mode=bilinear, padding=zeros,
    align_corners=False) for value [N, C, H, W], grid [N, Q, P, 2] in [-1, 1].
    Returns [N, C, Q, P]."""
    n, c, h, w = value.shape
    x = (grid[..., 0].astype(jnp.float32) + 1.0) * w / 2.0 - 0.5
    y = (grid[..., 1].astype(jnp.float32) + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    flat = value.reshape(n, c, h * w)

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yi_c * w + xi_c).reshape(n, -1)  # [N, Q*P]
        g = jnp.take_along_axis(flat, idx[:, None, :].repeat(c, axis=1), axis=2)
        g = g.reshape(n, c, *xi.shape[1:])
        return g * (wgt * inb.astype(jnp.float32))[:, None].astype(g.dtype)

    wx1 = x - x0
    wy1 = y - y0
    out = (corner(x0, y0, (1 - wx1) * (1 - wy1))
           + corner(x0 + 1, y0, wx1 * (1 - wy1))
           + corner(x0, y0 + 1, (1 - wx1) * wy1)
           + corner(x0 + 1, y0 + 1, wx1 * wy1))
    return out


def multi_scale_deformable_attention(value, spatial_shapes, sampling_locations,
                                     attention_weights):
    """reference MultiScaleDeformableAttention.forward :570.

    value: [B, S, heads, head_dim] (S = sum of level H*W)
    spatial_shapes: list of (H, W) python ints
    sampling_locations: [B, Q, heads, levels, points, 2] in [0, 1]
    attention_weights: [B, Q, heads, levels, points]
    Returns [B, Q, heads * head_dim].
    """
    b, _, heads, head_dim = value.shape
    _, q, _, levels, points, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in splits:
        offsets.append(offsets[-1] + s)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offsets[lvl] : offsets[lvl + 1]]  # [B, HW, heads, d]
        v = jnp.transpose(v, (0, 2, 3, 1)).reshape(b * heads, head_dim, h, w)
        g = jnp.transpose(grids[:, :, :, lvl], (0, 2, 1, 3, 4))  # [B, heads, Q, P, 2]
        g = g.reshape(b * heads, q, points, 2)
        sampled.append(grid_sample_bilinear(v, g))  # [B*heads, d, Q, P]
    # [B*heads, d, Q, levels, P] -> weighted sum over levels*points
    stacked = jnp.stack(sampled, axis=3).reshape(b * heads, head_dim, q,
                                                 levels * points)
    weights = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(
        b * heads, 1, q, levels * points).astype(stacked.dtype)
    out = jnp.sum(stacked * weights, axis=-1)  # [B*heads, d, Q]
    out = out.reshape(b, heads * head_dim, q)
    return jnp.swapaxes(out, 1, 2)


def multi_scale_deformable_attention_v2(value, spatial_shapes, sampling_locations,
                                        attention_weights, num_points_list,
                                        method="default"):
    """RT-DETRv2 variant (reference models/rt_detr_v2/modeling_rt_detr_v2.py:44):
    flat (levels*points) sampling axis and an optional 'discrete'
    nearest-neighbor sampling mode.

    sampling_locations: [B, Q, heads, sum(points), 2] in [0, 1]
    attention_weights:  [B, Q, heads, sum(points)]
    """
    b, _, heads, head_dim = value.shape
    _, q = sampling_locations.shape[:2]
    splits = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in splits:
        offsets.append(offsets[-1] + s)
    grids = 2 * sampling_locations - 1 if method == "default" else sampling_locations
    grids = jnp.swapaxes(grids, 1, 2).reshape(b * heads, q, -1, 2)
    point_offsets = [0]
    for p in num_points_list:
        point_offsets.append(point_offsets[-1] + p)
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offsets[lvl] : offsets[lvl + 1]]
        v = jnp.transpose(v, (0, 2, 3, 1)).reshape(b * heads, head_dim, h, w)
        g = grids[:, :, point_offsets[lvl] : point_offsets[lvl + 1]]
        if method == "default":
            sampled.append(grid_sample_bilinear(v, g))
        else:  # 'discrete': round to the nearest texel, clamped
            coord = (g * jnp.asarray([w, h], g.dtype) + 0.5).astype(jnp.int32)
            x = jnp.clip(coord[..., 0], 0, w - 1)
            y = jnp.clip(coord[..., 1], 0, h - 1)
            idx = (y * w + x).reshape(b * heads, -1)
            flat = v.reshape(b * heads, head_dim, h * w)
            out = jnp.take_along_axis(flat, idx[:, None, :].repeat(head_dim, 1), axis=2)
            sampled.append(out.reshape(b * heads, head_dim, q, -1))
    stacked = jnp.concatenate(sampled, axis=-1)  # [B*heads, d, Q, sum(points)]
    weights = jnp.swapaxes(attention_weights, 1, 2).reshape(
        b * heads, 1, q, -1).astype(stacked.dtype)
    out = jnp.sum(stacked * weights, axis=-1).reshape(b, heads * head_dim, q)
    return jnp.swapaxes(out, 1, 2)
