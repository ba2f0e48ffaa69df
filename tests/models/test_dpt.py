"""DPT depth-estimation parity: ViT backbone -> reassemble -> fusion -> head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CASES = {
    "dpt": dict(readout_type="project"),
    "dpt-add": dict(readout_type="add"),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_depth_parity(case, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.DPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8,
        backbone_out_indices=[0, 1, 2, 3], neck_hidden_sizes=[8, 16, 24, 32],
        fusion_hidden_size=16, **CASES[case], attn_implementation="eager")
    tm = transformers.DPTForDepthEstimation(cfg).eval()
    d = str(tmp_path / case)
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForDepthEstimation.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels)).predicted_depth.numpy()
    out = m(m.params, pixel_values=jnp.asarray(pixels)).predicted_depth
    assert max_abs_diff(out, ref) < 1e-4, case


def test_depth_anything_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    bb = dict(model_type="dinov2", hidden_size=32, num_hidden_layers=4,
              num_attention_heads=4, mlp_ratio=2, image_size=32, patch_size=8,
              out_indices=[1, 2, 3, 4], apply_layernorm=True,
              reshape_hidden_states=False)
    cfg = transformers.DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=16, neck_hidden_sizes=[8, 16, 24, 32],
        reassemble_hidden_size=32, patch_size=8)
    tm = transformers.DepthAnythingForDepthEstimation(cfg).eval()
    d = str(tmp_path / "depth_anything")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForDepthEstimation.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels)).predicted_depth.numpy()
    out = m(m.params, pixel_values=jnp.asarray(pixels)).predicted_depth
    assert max_abs_diff(out, ref) < 1e-4
