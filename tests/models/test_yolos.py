"""YOLOS parity vs torch: detection tokens through a plain ViT + DETR-style
MLP heads, with mid-position embeddings."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 32, 48)).astype(np.float32)


def test_logit_and_box_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.YolosConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=[32, 48], patch_size=16,
        num_detection_tokens=5, num_labels=3, attn_implementation="eager")
    tm = transformers.YolosForObjectDetection(cfg).eval()
    d = str(tmp_path / "yolos")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX))
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref.logits.numpy()).max() < 3e-5
    assert np.abs(np.asarray(out.pred_boxes) - ref.pred_boxes.numpy()).max() < 3e-5
