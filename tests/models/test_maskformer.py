"""MaskFormer parity vs torch: Swin + FPN + DETR query decoder + mask heads."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers, **kw):
    return transformers.MaskFormerConfig(
        backbone_config=dict(model_type="swin", embed_dim=16,
                             depths=[1, 1, 1, 1], num_heads=[2, 2, 2, 2],
                             image_size=64, patch_size=4, window_size=2),
        decoder_config=dict(model_type="detr", d_model=32, decoder_layers=2,
                            decoder_attention_heads=4, decoder_ffn_dim=64,
                            num_queries=10),
        fpn_feature_size=32, mask_feature_size=32, num_labels=5, **kw)


def test_maskformer_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.MaskFormerForInstanceSegmentation(_cfg(transformers)).eval()
    d = str(tmp_path / "maskformer")
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
                        ref.class_queries_logits.numpy()) < 5e-5
    assert max_abs_diff(out.masks_queries_logits,
                        ref.masks_queries_logits.numpy()) < 1e-4


def test_maskformer_loss_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.MaskFormerForInstanceSegmentation(_cfg(transformers)).eval()
    d = str(tmp_path / "maskformer_l")
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
    assert abs(float(out.loss) - ref) / max(abs(ref), 1) < 2e-3, \
        (float(out.loss), ref)
