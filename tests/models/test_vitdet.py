"""VitDet parity vs torch: windowed rel-pos attention + bottleneck residuals."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_vitdet_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.VitDetConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        image_size=32, pretrain_image_size=32, patch_size=8,
        window_size=2, window_block_indices=[0, 2], residual_block_indices=[1],
        use_relative_position_embeddings=True)
    tm = transformers.VitDetModel(cfg).eval()
    d = str(tmp_path / "vitdet")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    out = m(m.params, pixel_values=px).last_hidden_state
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
