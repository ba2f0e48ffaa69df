"""BLIP-2 parity: ViT -> Q-Former -> OPT composition with image-token scatter."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=16, patch_size=8),
    qformer_config=dict(hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=48, cross_attention_frequency=2),
    text_config=dict(model_type="opt", vocab_size=99, hidden_size=32, num_hidden_layers=2,
                     ffn_dim=64, num_attention_heads=4, max_position_embeddings=128,
                     word_embed_proj_dim=32),
    num_query_tokens=4,
    image_token_index=98,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("blip2"))
    torch.manual_seed(0)
    config = transformers.Blip2Config(**TINY)
    tm = transformers.Blip2ForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _inputs():
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ids = np.array([[98, 98, 98, 98, 5, 9, 3, 7]], dtype=np.int64)
    return ids, pixels


def test_forward_logit_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    missing = [k for k in model.load_report.missing_keys]
    assert not missing, missing
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids, pixels = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, pixels = _inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                          max_new_tokens=5, do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    pixel_values=jnp.asarray(pixels),
                                    max_new_tokens=5, prompt_pad_multiple=8,
                                    eos_token_id=-1))
    # torch blip2 generate returns only generated ids (no prompt) for OPT? both
    # layouts handled: compare the generated tail.
    gen_ref = ref[0, -5:] if ref.shape[1] >= 5 else ref[0]
    np.testing.assert_array_equal(out[0, -len(gen_ref):], gen_ref)
