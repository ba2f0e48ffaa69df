"""SigLIP2 (NaFlex) parity vs torch: per-image resized positional
embeddings, masked encoder/pool, contrastive head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


def _make(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Siglip2Config(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=32),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, num_patches=16, patch_size=4),
    )
    tm = transformers.Siglip2Model(cfg).eval()
    d = str(tmp_path / "siglip2")
    tm.save_pretrained(d, safe_serialization=True)
    return tm, d


def _inputs():
    # 2 images: 4x4 grid (= source grid, identity resize) and 2x3 (downscale)
    L = 16
    pix = RNG.normal(size=(2, L, 3 * 4 * 4)).astype(np.float32)
    mask = np.zeros((2, L), np.int32)
    mask[0, :16] = 1
    mask[1, :6] = 1
    shapes = np.array([[4, 4], [2, 3]], np.int64)
    ids = RNG.integers(1, 63, size=(2, 8)).astype(np.int64)
    return pix, mask, shapes, ids


def test_siglip2_parity(tmp_path):
    import torch

    tm, d = _make(tmp_path)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    pix, mask, shapes, ids = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix),
                 pixel_attention_mask=torch.from_numpy(mask),
                 spatial_shapes=torch.from_numpy(shapes))
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix),
            pixel_attention_mask=jnp.asarray(mask),
            spatial_shapes=jnp.asarray(shapes))
    np.testing.assert_allclose(np.asarray(out.logits_per_text),
                               ref.logits_per_text.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out.image_embeds),
                               ref.image_embeds.numpy(), atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out.text_embeds),
                               ref.text_embeds.numpy(), atol=2e-5, rtol=2e-4)
