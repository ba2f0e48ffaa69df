"""CLIPSeg parity vs torch: CLIP towers + FiLM-conditioned decoder."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers, **kw):
    return transformers.CLIPSegConfig(
        text_config=dict(vocab_size=90, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=32),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=4, num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=16, reduce_dim=16, extract_layers=[1, 2, 3],
        decoder_intermediate_size=32, **kw)


def _inputs():
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(3, 90, size=(2, 7))
    ids[:, -1] = 49407 % 90  # any id; pooling uses argmax for legacy eos==2
    mask = np.ones((2, 7), np.int64)
    return px, ids, mask


def test_clipseg_segmentation_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.CLIPSegForImageSegmentation(_cfg(transformers)).eval()
    d = str(tmp_path / "clipseg")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px, ids, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=ids, pixel_values=px, attention_mask=mask)
    assert out.logits.shape == tuple(ref.logits.shape)
    assert max_abs_diff(out.conditional_embeddings,
                        ref.conditional_embeddings.numpy()) < 3e-5
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 5e-5, \
        max_abs_diff(out.logits, ref.logits.numpy())


def test_clipseg_complex_deconv_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = _cfg(transformers, use_complex_transposed_convolution=True)
    tm = transformers.CLIPSegForImageSegmentation(cfg).eval()
    d = str(tmp_path / "clipseg_cx")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px, ids, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    out = m(m.params, input_ids=ids, pixel_values=px, attention_mask=mask).logits
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)
