"""ViTMatte parity vs torch: VitDet backbone + detail-capture fusion."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_vitmatte_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.VitMatteConfig(
        backbone_config=dict(model_type="vitdet", hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, pretrain_image_size=32,
                             patch_size=16, num_channels=4,
                             out_features=["stage2"]),
        hidden_size=32, convstream_hidden_sizes=[8, 12, 16],
        fusion_hidden_sizes=[24, 16, 12, 8])
    tm = transformers.VitMatteForImageMatting(cfg).eval()
    d = str(tmp_path / "vitmatte")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).alphas.numpy()
    out = m(m.params, pixel_values=px).alphas
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
