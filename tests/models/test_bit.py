"""BiT parity vs torch: weight-standardized convs + group norms (both
pre-activation and bottleneck layouts, SAME padding)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)


@pytest.mark.parametrize("layer_type,padding", [("preactivation", "SAME"),
                                                ("bottleneck", None)])
def test_classification_parity(layer_type, padding, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.BitConfig(
        embedding_size=8, hidden_sizes=[16, 32], depths=[1, 2],
        layer_type=layer_type, global_padding=padding, num_groups=4,
        embedding_dynamic_padding=(padding == "SAME"), num_labels=3)
    tm = transformers.BitForImageClassification(cfg).eval()
    d = str(tmp_path / f"bit_{layer_type}")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5, layer_type
