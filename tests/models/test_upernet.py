"""UperNet parity vs torch: ConvNext backbone + PSP/FPN decode head."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _tiny_cfg(transformers, **kw):
    return transformers.UperNetConfig(
        backbone_config=dict(model_type="convnext", hidden_sizes=[8, 16, 32, 64],
                             depths=[1, 1, 1, 1], num_channels=3,
                             out_features=["stage1", "stage2", "stage3", "stage4"]),
        hidden_size=16, pool_scales=[1, 2, 3, 6], num_labels=5,
        auxiliary_channels=8, auxiliary_num_convs=1, **kw)


def test_upernet_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = _tiny_cfg(transformers)
    tm = transformers.UperNetForSemanticSegmentation(cfg).eval()
    d = str(tmp_path / "upernet")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).logits.numpy()
    out = m(m.params, pixel_values=px).logits
    assert out.shape == (1, 5, 64, 64)
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)


def test_upernet_loss(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = _tiny_cfg(transformers)
    tm = transformers.UperNetForSemanticSegmentation(cfg).eval()
    d = str(tmp_path / "upernet")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    px = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    labels = np.random.default_rng(2).integers(0, 5, size=(1, 32, 32))
    labels[0, :4, :4] = 255  # ignore_index region
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px),
                 labels=torch.tensor(labels)).loss.item()
    out = m(m.params, pixel_values=px, labels=labels)
    assert abs(float(out.loss) - ref) < 1e-4, (float(out.loss), ref)
