"""FocalNet parity vs torch: focal modulation blocks + hierarchy."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers, **kw):
    return transformers.FocalNetConfig(
        image_size=32, patch_size=4, embed_dim=16,
        hidden_sizes=[32, 64, 64], depths=[1, 1, 2],
        focal_levels=[2, 2, 2], focal_windows=[3, 3, 3], **kw)


def test_focalnet_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.FocalNetModel(_cfg(transformers)).eval()
    d = str(tmp_path / "focal")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px))
    out = m(m.params, pixel_values=px)
    assert max_abs_diff(out.last_hidden_state, ref.last_hidden_state.numpy()) < 3e-5
    assert max_abs_diff(out.pooler_output, ref.pooler_output.numpy()) < 3e-5


def test_focalnet_classifier_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = _cfg(transformers, use_layerscale=True, num_labels=5)
    tm = transformers.FocalNetForImageClassification(cfg).eval()
    d = str(tmp_path / "focal_cls")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).logits.numpy()
    out = m(m.params, pixel_values=px).logits
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
