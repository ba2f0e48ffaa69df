"""ShieldGemma 2 parity: yes/no verdict logits over the Gemma3 VLM
(reference models/shieldgemma2/modeling_shieldgemma2.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402

IMG = 95
YES, NO = 7, 11
TINY = dict(
    vision_config=dict(model_type="siglip_vision_model", hidden_size=32,
                       intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=16, patch_size=4),
    text_config=dict(model_type="gemma3_text", vocab_size=99, hidden_size=32,
                     intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                     max_position_embeddings=128, sliding_window=4,
                     sliding_window_pattern=2, pad_token_id=0, bos_token_id=1,
                     eos_token_id=2),
    mm_tokens_per_image=4,
    image_token_index=IMG,
    boi_token_index=93,
    eoi_token_index=94,
    yes_token_index=YES,
    no_token_index=NO,
)


def _inputs(b=2):
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(b, 3, 16, 16)).astype(np.float32)
    ids = np.array([[2, 93, IMG, IMG, IMG, IMG, 94, 5, 9, 3]] * b, np.int64)
    tt = (ids == IMG).astype(np.int64)
    return ids, pixels, tt


def test_shieldgemma2_verdict_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.ShieldGemma2Config(**TINY, attn_implementation="eager")
    tm = transformers.ShieldGemma2ForImageClassification(config).eval()
    d = str(tmp_path / "sg2")
    tm.save_pretrained(d, safe_serialization=True)

    ids, pixels, tt = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 token_type_ids=torch.tensor(tt))

    from transformers_tpu.models.shieldgemma2 import (
        ShieldGemma2ForImageClassification,
    )

    model = ShieldGemma2ForImageClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    out = model(model.params, input_ids=ids, pixel_values=pixels,
                token_type_ids=tt)
    assert out.logits.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out.logits), ref.logits.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.probabilities),
                               ref.probabilities.numpy(), atol=2e-5)
