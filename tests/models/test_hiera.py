"""Hiera parity vs torch: token unroll, mask-unit attention, query pooling."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(embed_dim=8, image_size=[64, 64], patch_size=[7, 7],
           patch_stride=[4, 4], patch_padding=[3, 3], depths=[1, 1, 1, 1],
           num_heads=[1, 1, 2, 2], embed_dim_multiplier=2.0, num_query_pool=2,
           query_stride=[2, 2], masked_unit_size=[8, 8],
           masked_unit_attention=[True, True, False, False], num_labels=5)


def test_hiera_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.HieraForImageClassification(
        transformers.HieraConfig(**CFG)).eval()
    d = str(tmp_path / "hiera")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).logits.numpy()
    out = m(m.params, pixel_values=px).logits
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
