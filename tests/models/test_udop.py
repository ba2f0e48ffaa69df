"""UDOP parity vs torch: layout-aware T5 with fused image patches."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers):
    return transformers.UdopConfig(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, image_size=32, patch_size=16,
        dropout_rate=0.0)


def _inputs():
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 120, size=(1, 9))
    bbox = np.sort(rng.uniform(0.05, 0.95, size=(1, 9, 4)).astype(np.float32),
                   axis=-1)
    px = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    dec = rng.integers(2, 120, size=(1, 5))
    return ids, bbox, px, dec


def test_udop_text_only_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.UdopForConditionalGeneration(_cfg(transformers)).eval()
    d = str(tmp_path / "udop")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids, bbox, px, dec = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), bbox=torch.tensor(bbox),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_ids=ids, bbox=bbox, decoder_input_ids=dec).logits
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)


def test_udop_with_image_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.UdopForConditionalGeneration(_cfg(transformers)).eval()
    d = str(tmp_path / "udop_img")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    ids, bbox, px, dec = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), bbox=torch.tensor(bbox),
                 pixel_values=torch.tensor(px),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_ids=ids, bbox=bbox, pixel_values=px,
            decoder_input_ids=dec).logits
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)
