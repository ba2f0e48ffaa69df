"""OwlViT zero-shot detection parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402


def make_owlvit(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.OwlViTConfig(
        text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=16),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=16,
                           num_channels=3),
        projection_dim=32)
    tm = transformers.OwlViTForObjectDetection(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_zero_shot_detection_parity(tmp_path):
    import torch

    d = str(tmp_path / "owlvit")
    tm = make_owlvit(d)
    m = ttpu.AutoModelForZeroShotObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    # 2 queries per image (batched flat), one fully padded
    ids = np.array([[90, 5, 9, 95, 0, 0], [90, 7, 95, 0, 0, 0],
                    [90, 3, 8, 95, 0, 0], [0, 0, 0, 0, 0, 0]], np.int64)
    mask = (ids > 0).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.from_numpy(px),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(px),
            attention_mask=jnp.asarray(mask))
    assert np.abs(np.asarray(out.logits) - ref.logits.numpy()).max() < 1e-4
    assert np.abs(np.asarray(out.pred_boxes) - ref.pred_boxes.numpy()).max() < 3e-5
    res = type(m).post_process_grounded_object_detection(
        out, threshold=0.0, target_sizes=[(32, 32), (32, 32)],
        text_labels=[["cat", "dog"], ["bird", "pad"]])
    assert len(res) == 2 and "boxes" in res[0]


def test_owlv2_parity(tmp_path):
    import torch
    import transformers

    from parity_utils import max_abs_diff

    torch.manual_seed(0)
    cfg = transformers.Owlv2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        text_config=dict(hidden_size=24, intermediate_size=48, num_hidden_layers=2,
                         num_attention_heads=4, vocab_size=99,
                         max_position_embeddings=16),
        projection_dim=24)
    tm = transformers.Owlv2ForObjectDetection(cfg).eval()
    d = str(tmp_path / "owlv2")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForZeroShotObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[90, 5, 6, 95], [90, 9, 95, 0]])
    mask = (ids > 0).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 5e-4
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-3
    assert max_abs_diff(out.objectness_logits, ref.objectness_logits.numpy()) < 5e-4
