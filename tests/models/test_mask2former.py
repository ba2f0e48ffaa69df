"""Mask2Former parity vs torch: deformable pixel decoder + masked attention."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers):
    return transformers.Mask2FormerConfig(
        backbone_config=dict(model_type="swin", embed_dim=16,
                             depths=[1, 1, 1, 1], num_heads=[2, 2, 2, 2],
                             image_size=64, patch_size=4, window_size=2,
                             out_features=["stage1", "stage2", "stage3",
                                           "stage4"]),
        feature_size=32, mask_feature_size=32, hidden_dim=32,
        encoder_feedforward_dim=64, encoder_layers=2, decoder_layers=3,
        num_attention_heads=4, dim_feedforward=64, num_queries=10,
        num_labels=5)


def test_mask2former_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.Mask2FormerForUniversalSegmentation(_cfg(transformers)).eval()
    d = str(tmp_path / "m2f")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px))
    out = m(m.params, pixel_values=px)
    assert out.masks_queries_logits.shape == tuple(ref.masks_queries_logits.shape)
    assert max_abs_diff(out.class_queries_logits,
                        ref.class_queries_logits.numpy()) < 1e-4, \
        max_abs_diff(out.class_queries_logits, ref.class_queries_logits.numpy())
    assert max_abs_diff(out.masks_queries_logits,
                        ref.masks_queries_logits.numpy()) < 2e-4, \
        max_abs_diff(out.masks_queries_logits, ref.masks_queries_logits.numpy())


def test_mask2former_loss_sane(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.Mask2FormerForUniversalSegmentation(_cfg(transformers)).eval()
    d = str(tmp_path / "m2f_l")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    mask_labels = [(rng.uniform(size=(3, 64, 64)) > 0.5).astype(np.float32)]
    class_labels = [np.array([0, 2, 4])]
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px),
                 mask_labels=[torch.tensor(m_) for m_ in mask_labels],
                 class_labels=[torch.tensor(c) for c in class_labels]).loss.item()
    out = m(m.params, pixel_values=px, mask_labels=mask_labels,
            class_labels=class_labels)
    # point sampling uses an independent RNG: statistical agreement only
    assert np.isfinite(float(out.loss))
    assert abs(float(out.loss) - ref) / ref < 0.1, (float(out.loss), ref)
