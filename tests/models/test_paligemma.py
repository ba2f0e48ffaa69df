"""PaliGemma parity: prefix-LM forward with image scatter + greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vision_config=dict(model_type="siglip_vision_model", hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4, image_size=16, patch_size=8),
    text_config=dict(model_type="gemma", vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                     head_dim=8, max_position_embeddings=128, pad_token_id=0,
                     bos_token_id=1, eos_token_id=2),
    image_token_index=98,
    projection_dim=32,
)


@pytest.fixture(scope="module")
def pg_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("paligemma"))
    torch.manual_seed(0)
    config = transformers.PaliGemmaConfig(**TINY, attn_implementation="eager")
    tm = transformers.PaliGemmaForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _inputs(b=1):
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(b, 3, 16, 16)).astype(np.float32)
    ids = np.array([[98, 98, 98, 98, 1, 5, 9, 3]] * b, dtype=np.int64)
    return ids, pixels


def test_forward_logit_parity(pg_ckpt):
    import torch

    d, tm = pg_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids, pixels = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 attention_mask=torch.ones_like(torch.tensor(ids))).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(pg_ckpt):
    import torch

    d, tm = pg_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, pixels = _inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                          attention_mask=torch.ones_like(torch.tensor(ids)),
                          max_new_tokens=6, do_sample=False, pad_token_id=0).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    pixel_values=jnp.asarray(pixels),
                                    max_new_tokens=6, prompt_pad_multiple=8))
    np.testing.assert_array_equal(out[0], ref[0])
