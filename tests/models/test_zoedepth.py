"""ZoeDepth parity vs torch: BEiT backbone + DPT neck + attractor-bin heads."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _backbone_cfg():
    return dict(model_type="beit", image_size=64, patch_size=16, hidden_size=32,
                num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=64, use_relative_position_bias=True,
                reshape_hidden_states=False,
                out_features=["stage1", "stage2", "stage3", "stage4"])


def test_zoedepth_single_head_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ZoeDepthConfig(
        backbone_config=_backbone_cfg(),
        neck_hidden_sizes=[8, 16, 24, 32], fusion_hidden_size=16,
        bottleneck_features=16, num_relative_features=8,
        bin_embedding_dim=8, num_attractors=[4, 2, 2, 1],
        bin_configurations=[{"n_bins": 8, "min_depth": 0.001, "max_depth": 10.0}])
    tm = transformers.ZoeDepthForDepthEstimation(cfg).eval()
    d = str(tmp_path / "zoe")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).predicted_depth.numpy()
    out = m(m.params, pixel_values=px).predicted_depth
    assert out.shape == ref.shape
    assert max_abs_diff(out, ref) < 1e-4, max_abs_diff(out, ref)


def test_zoedepth_multi_head_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.ZoeDepthConfig(
        backbone_config=_backbone_cfg(),
        neck_hidden_sizes=[8, 16, 24, 32], fusion_hidden_size=16,
        bottleneck_features=16, num_relative_features=8,
        bin_embedding_dim=8, num_attractors=[4, 2, 2, 1],
        bin_centers_type="softplus",
        bin_configurations=[
            {"name": "nyu", "n_bins": 8, "min_depth": 0.001, "max_depth": 10.0},
            {"name": "kitti", "n_bins": 8, "min_depth": 0.001, "max_depth": 80.0}],
        num_patch_transformer_layers=4, patch_transformer_hidden_size=128,
        patch_transformer_intermediate_size=256,
        patch_transformer_num_attention_heads=4)
    tm = transformers.ZoeDepthForDepthEstimation(cfg).eval()
    d = str(tmp_path / "zoe_mh")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tout = tm(pixel_values=torch.tensor(px))
        ref = tout.predicted_depth.numpy()
    out = m(m.params, pixel_values=px)
    assert max_abs_diff(out.domain_logits, tout.domain_logits.numpy()) < 5e-5
    assert max_abs_diff(out.predicted_depth, ref) < 1e-4, \
        max_abs_diff(out.predicted_depth, ref)
