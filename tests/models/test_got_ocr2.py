"""GOT-OCR2 parity vs torch: SAM-style vision tower + conv projector +
Qwen2 decoder with image-token scatter."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(
    vision_config=dict(hidden_size=32, output_channels=16, num_hidden_layers=2,
                       num_attention_heads=4, image_size=64, patch_size=8,
                       window_size=4, global_attn_indexes=[1], mlp_dim=48),
    text_config=dict(vocab_size=120, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128,
                     tie_word_embeddings=False),
    image_token_index=110)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("gotocr2"))
    torch.manual_seed(0)
    tm = transformers.GotOcr2ForConditionalGeneration(
        transformers.GotOcr2Config(**CFG, attn_implementation="eager")).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _inputs():
    # vision: 64/8=8 grid -> projector /4 -> 2x2 = 4 image tokens
    px = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    ids = np.array([[5, 110, 110, 110, 110, 9, 3]])
    return ids, px


def test_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids, px = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(px)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5, max_abs_diff(out.logits, ref)


def test_generate_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, px = _inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids),
                          pixel_values=torch.tensor(px), max_new_tokens=6,
                          do_sample=False)
    out = m.generate(m.params, input_ids=jnp.asarray(ids),
                     pixel_values=jnp.asarray(px), max_new_tokens=6,
                     prompt_pad_multiple=7, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(out)[0, -6:], ref.numpy()[0, -6:])
