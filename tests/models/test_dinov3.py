"""DINOv3 ViT + ConvNext parity vs torch."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_dinov3_vit_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.DINOv3ViTConfig(
        patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, image_size=32,
        num_register_tokens=2, use_gated_mlp=True)
    tm = transformers.DINOv3ViTModel(cfg).eval()
    d = str(tmp_path / "d3vit")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    out = m(m.params, pixel_values=px).last_hidden_state
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)


def test_dinov3_vit_ungated_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.DINOv3ViTConfig(
        patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, image_size=32)
    tm = transformers.DINOv3ViTModel(cfg).eval()
    d = str(tmp_path / "d3vit_u")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    out = m(m.params, pixel_values=px).last_hidden_state
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)


def test_dinov3_convnext_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(2)
    cfg = transformers.DINOv3ConvNextConfig(
        hidden_sizes=[8, 16, 32, 64], depths=[1, 1, 2, 1], image_size=32)
    tm = transformers.DINOv3ConvNextModel(cfg).eval()
    d = str(tmp_path / "d3cnx")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(2).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px))
    out = m(m.params, pixel_values=px)
    assert max_abs_diff(out.last_hidden_state, ref.last_hidden_state.numpy()) < 3e-5
    assert max_abs_diff(out.pooler_output, ref.pooler_output.numpy()) < 3e-5
