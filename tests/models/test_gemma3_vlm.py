"""Gemma3 multimodal parity: avg-pool projector, blockwise-bidirectional
image attention, greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IMG = 95
TINY = dict(
    vision_config=dict(model_type="siglip_vision_model", hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4, image_size=16, patch_size=4),
    text_config=dict(model_type="gemma3_text", vocab_size=99, hidden_size=32,
                     intermediate_size=64, num_hidden_layers=4, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
                     sliding_window=4, sliding_window_pattern=2, pad_token_id=0,
                     bos_token_id=1, eos_token_id=2),
    mm_tokens_per_image=4,
    image_token_index=IMG,
    boi_token_index=93,
    eoi_token_index=94,
)


@pytest.fixture(scope="module")
def g3_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("gemma3vlm"))
    torch.manual_seed(0)
    config = transformers.Gemma3Config(**TINY, attn_implementation="eager")
    tm = transformers.Gemma3ForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _inputs(b=1):
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(b, 3, 16, 16)).astype(np.float32)
    # boi, 4 image tokens, eoi, then text
    ids = np.array([[2, 93, IMG, IMG, IMG, IMG, 94, 5, 9, 3]] * b, dtype=np.int64)
    tt = (ids == IMG).astype(np.int64)
    return ids, pixels, tt


def test_forward_logit_parity(g3_ckpt):
    import torch

    d, tm = g3_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids, pixels, tt = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 token_type_ids=torch.tensor(tt),
                 attention_mask=torch.ones_like(torch.tensor(ids))).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_blockwise_mask_matters(g3_ckpt):
    """The image block must attend bidirectionally: zeroing the overlay
    (running the text model purely causally) must change image-slot logits."""
    d, _ = g3_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, pixels, tt = _inputs()
    out = model(model.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels))
    causal = model(model.params, input_ids=jnp.asarray(ids),
                   pixel_values=jnp.asarray(pixels),
                   token_type_ids=jnp.zeros_like(jnp.asarray(ids)))
    assert float(jnp.max(jnp.abs(out.logits[:, 2:6] - causal.logits[:, 2:6]))) > 1e-6


def test_greedy_generate_matches_torch(g3_ckpt):
    import torch

    d, tm = g3_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, pixels, tt = _inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                          token_type_ids=torch.tensor(tt),
                          attention_mask=torch.ones_like(torch.tensor(ids)),
                          max_new_tokens=6, do_sample=False, pad_token_id=0).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    pixel_values=jnp.asarray(pixels),
                                    max_new_tokens=6, prompt_pad_multiple=10))
    np.testing.assert_array_equal(out[0], ref[0])
