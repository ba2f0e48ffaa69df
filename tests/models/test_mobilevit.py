"""MobileViT parity vs torch: classification head (unfold/fold transformer
blocks) and DeepLabV3 segmentation head (ASPP)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(num_channels=3, image_size=64, patch_size=2,
           hidden_sizes=(16, 24, 32), neck_hidden_sizes=(8, 12, 16, 24, 32, 40, 64),
           num_attention_heads=2, expand_ratio=2.0, aspp_out_channels=16,
           atrous_rates=(1, 2, 3), num_labels=5)


def make_tiny(tmp_dir, arch, **over):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.MobileViTConfig(**{**CFG, **over},
                                          attn_implementation="eager")
    tm = getattr(transformers, arch)(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_classification_parity(tmp_path):
    import torch

    d = str(tmp_path / "cls")
    tm = make_tiny(d, "MobileViTForImageClassification")
    model = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    px = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).logits.numpy()
    out = model(model.params, pixel_values=jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-4


def test_segmentation_parity(tmp_path):
    import torch

    d = str(tmp_path / "seg")
    tm = make_tiny(d, "MobileViTForSemanticSegmentation", output_stride=8)
    model = ttpu.AutoModelForSemanticSegmentation.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    px = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).logits.numpy()
    out = model(model.params, pixel_values=jnp.asarray(px))
    assert out.logits.shape == ref.shape
    assert max_abs_diff(out.logits, ref) < 5e-4
