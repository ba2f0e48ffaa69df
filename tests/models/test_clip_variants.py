"""ChineseCLIP + AltCLIP parity vs torch (contrastive dual encoders)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(3, 3, 32, 32)).astype(np.float32)
IDS = np.array([[2, 14, 25, 36, 7, 3], [2, 9, 11, 3, 0, 0]], np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], np.int64)


def _check(m, tm, torch, input_ids, mask):
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(input_ids),
                 attention_mask=torch.from_numpy(mask),
                 pixel_values=torch.from_numpy(PX))
    out = m(m.params, input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(mask), pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits_per_image)
                  - ref.logits_per_image.numpy()).max() < 1e-3
    assert np.abs(np.asarray(out.text_embeds) - ref.text_embeds.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.image_embeds) - ref.image_embeds.numpy()).max() < 5e-5


def test_chinese_clip_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ChineseCLIPConfig(
        text_config=dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=48,
                         max_position_embeddings=64),
        vision_config=dict(hidden_size=24, intermediate_size=36,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=16)
    tm = transformers.ChineseCLIPModel(cfg).eval()
    d = str(tmp_path / "cclip")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    _check(m, tm, torch, IDS, MASK)


def test_altclip_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.AltCLIPConfig(
        text_config=dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=48,
                         max_position_embeddings=68, project_dim=20),
        vision_config=dict(hidden_size=24, intermediate_size=36,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=16)
    tm = transformers.AltCLIPModel(cfg).eval()
    d = str(tmp_path / "altclip")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    _check(m, tm, torch, IDS, MASK)
