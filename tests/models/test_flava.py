"""FLAVA parity vs torch: image/text/multimodal encoders, codebook, heads."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _tiny_cfg(transformers):
    return transformers.FlavaConfig(
        image_config=dict(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          image_size=32, patch_size=16, vocab_size=48),
        text_config=dict(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         vocab_size=99, max_position_embeddings=64),
        multimodal_config=dict(hidden_size=32, num_hidden_layers=2,
                               num_attention_heads=4, intermediate_size=64),
        image_codebook_config=dict(num_groups=2, num_blocks_per_group=1,
                                   hidden_size=4, vocab_size=48),
        hidden_size=32, projection_dim=16)


def _inputs():
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(1, 99, size=(2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0
    return px, ids, mask


def test_flava_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.FlavaModel(_tiny_cfg(transformers)).eval()
    d = str(tmp_path / "flava")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px, ids, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(mask), output_hidden_states=True)
    out = m(m.params, input_ids=ids, pixel_values=px, attention_mask=mask)
    for name in ("image_embeddings", "text_embeddings", "multimodal_embeddings"):
        got, want = getattr(out, name), getattr(ref, name).numpy()
        assert got.shape == want.shape, (name, got.shape, want.shape)
        assert max_abs_diff(got, want) < 3e-5, (name, max_abs_diff(got, want))


def test_flava_pretraining_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.FlavaForPreTraining(_tiny_cfg(transformers)).eval()
    d = str(tmp_path / "flava_pt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForPreTraining.from_pretrained(d, dtype="float32") \
        if hasattr(ttpu, "AutoModelForPreTraining") else None
    if m is None:
        from transformers_tpu.models.flava import FlavaForPreTraining
        m = FlavaForPreTraining.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px, ids, mask = _inputs()
    rng = np.random.default_rng(3)
    ids_masked = ids.copy()
    ids_masked[:, 2] = 5
    mlm_labels = np.full_like(ids, -100)
    mlm_labels[:, 2] = ids[:, 2]
    bool_masked_pos = rng.integers(0, 2, size=(2, 4)).astype(bool)
    bool_masked_pos[0, 0] = True  # ensure at least one masked patch
    # codebook downsamples by 8 (three max-pools); 16x16 -> 2x2 = 4 labels,
    # matching the 4 image patches of the 32px/patch16 encoder
    codebook_px = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    itm_labels = np.array([1, 1])
    kw = dict(input_ids=ids, input_ids_masked=ids_masked,
              attention_mask=mask, mlm_labels=mlm_labels,
              bool_masked_pos=bool_masked_pos, itm_labels=itm_labels,
              return_loss=True)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px),
                 codebook_pixel_values=torch.tensor(codebook_px),
                 **{k: torch.tensor(v) for k, v in kw.items()
                    if not isinstance(v, bool)}, return_loss=True)
    out = m(m.params, pixel_values=px, codebook_pixel_values=codebook_px, **kw)
    assert max_abs_diff(out.itm_logits, ref.itm_logits.numpy()) < 3e-5
    assert max_abs_diff(out.mmm_text_logits, ref.mmm_text_logits.numpy()) < 3e-5
    assert max_abs_diff(out.mmm_image_logits, ref.mmm_image_logits.numpy()) < 3e-5
    assert max_abs_diff(out.contrastive_logits_per_image,
                        ref.contrastive_logits_per_image.numpy()) < 3e-5
    assert abs(float(out.loss) - float(ref.loss)) < 1e-4, \
        (float(out.loss), float(ref.loss))


def test_flava_image_codebook_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(2)
    cfg = transformers.FlavaImageCodebookConfig(
        num_groups=2, num_blocks_per_group=1, hidden_size=4, vocab_size=16)
    tm = transformers.FlavaImageCodebook(cfg).eval()
    d = str(tmp_path / "codebook")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.flava.modeling_flava import FlavaImageCodebook
    m = FlavaImageCodebook.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(5).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).numpy()
    out = m(m.params, pixel_values=px)
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
