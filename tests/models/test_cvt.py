"""CvT parity vs torch: depthwise-conv qkv projections + last-stage CLS."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)


def test_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.CvtConfig(
        embed_dim=[8, 12, 16], num_heads=[1, 2, 2], depth=[1, 2, 3],
        num_labels=3)
    tm = transformers.CvtForImageClassification(cfg).eval()
    d = str(tmp_path / "cvt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5
