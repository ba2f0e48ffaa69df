"""Deformable DETR parity vs torch: single-stage, box-refine, and two-stage."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

CFG = dict(d_model=32, encoder_layers=2, decoder_layers=2,
           encoder_attention_heads=4, decoder_attention_heads=4,
           encoder_ffn_dim=48, decoder_ffn_dim=48, num_queries=8,
           num_feature_levels=4, num_labels=5, dropout=0.0,
           backbone=None, use_timm_backbone=False, use_pretrained_backbone=False,
           backbone_config=dict(model_type="resnet", embedding_size=8,
                                hidden_sizes=[8, 16, 32, 64], depths=[1, 1, 1, 1],
                                out_features=["stage2", "stage3", "stage4"]))


def build(tmp_path, **over):
    import torch
    import transformers

    cfg = transformers.DeformableDetrConfig(**{**CFG, **over})
    torch.manual_seed(0)
    tm = transformers.DeformableDetrForObjectDetection(cfg).eval()
    d = str(tmp_path)
    try:
        tm.save_pretrained(d, safe_serialization=True)
    except RuntimeError:
        # box-refine/two-stage wire decoder.bbox_embed to the top-level heads;
        # the reference refuses that sharing under safetensors and tells us to
        # fall back to torch.save
        tm.save_pretrained(d, safe_serialization=False)
    import transformers_tpu.models.deformable_detr as mod

    m = mod.DeformableDetrForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    return tm, m


def run_both(tm, m, seed=0):
    import torch

    px = np.random.default_rng(seed).standard_normal((2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(px))
    out = m(m.params, pixel_values=jnp.asarray(px))
    return ref, out


def test_single_stage(tmp_path):
    tm, m = build(tmp_path)
    ref, out = run_both(tm, m)
    assert out.logits.shape == tuple(ref.logits.shape)
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4, \
        max_abs_diff(out.logits, ref.logits.numpy())
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 2e-4


def test_box_refine(tmp_path):
    tm, m = build(tmp_path, with_box_refine=True)
    ref, out = run_both(tm, m, seed=1)
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 2e-4


def test_two_stage(tmp_path):
    tm, m = build(tmp_path, with_box_refine=True, two_stage=True,
                  two_stage_num_proposals=8)
    ref, out = run_both(tm, m, seed=2)
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 5e-4, \
        max_abs_diff(out.logits, ref.logits.numpy())
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 5e-4
    assert max_abs_diff(out.enc_outputs_class,
                        ref.enc_outputs_class.numpy()) < 5e-4


def test_loss_runs(tmp_path):
    tm, m = build(tmp_path)
    px = np.random.default_rng(3).standard_normal((1, 3, 128, 128)).astype(np.float32)
    labels = [{"class_labels": np.array([1, 3]),
               "boxes": np.array([[0.5, 0.5, 0.2, 0.2], [0.3, 0.7, 0.1, 0.4]],
                                 np.float32)}]
    out = m(m.params, pixel_values=jnp.asarray(px), labels=labels)
    assert np.isfinite(float(out.loss))

    import torch
    with torch.no_grad():
        ref = tm(torch.from_numpy(px),
                 labels=[{"class_labels": torch.tensor([1, 3]),
                          "boxes": torch.tensor([[0.5, 0.5, 0.2, 0.2],
                                                 [0.3, 0.7, 0.1, 0.4]])}])
    assert abs(float(out.loss) - float(ref.loss)) / float(ref.loss) < 0.05, \
        (float(out.loss), float(ref.loss))
