"""AIMv2 parity vs torch: SwiGLU RMSNorm dual encoder + contrastive logits."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers, native=False):
    return transformers.Aimv2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8, is_native=native),
        text_config=dict(vocab_size=90, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         eos_token_id=2, max_position_embeddings=32),
        projection_dim=16)


def _inputs():
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(3, 90, size=(2, 7))
    ids[:, -1] = 2  # eos
    mask = np.ones((2, 7), np.int64)
    return px, ids, mask


def test_aimv2_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.Aimv2Model(_cfg(transformers)).eval()
    d = str(tmp_path / "aimv2")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px, ids, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=ids, pixel_values=px, attention_mask=mask)
    assert max_abs_diff(out.logits_per_image, ref.logits_per_image.numpy()) < 3e-5
    assert max_abs_diff(out.image_embeds, ref.image_embeds.numpy()) < 3e-5
    assert max_abs_diff(out.text_embeds, ref.text_embeds.numpy()) < 3e-5


def test_aimv2_native_vision_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.Aimv2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8, is_native=True)
    tm = transformers.Aimv2VisionModel(cfg).eval()
    d = str(tmp_path / "aimv2_native")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.aimv2 import Aimv2VisionModel
    m = Aimv2VisionModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    out = m(m.params, pixel_values=px).last_hidden_state
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
