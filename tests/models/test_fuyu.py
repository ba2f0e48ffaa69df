"""Fuyu parity vs torch: linear patch embeddings scattered into the
Persimmon decoder; forward logits + greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IMAGE_TOKEN = 90


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.FuyuConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, patch_size=4, num_channels=3, image_size=16,
        max_position_embeddings=64, image_token_id=IMAGE_TOKEN,
        attn_implementation="eager")
    tm = transformers.FuyuForCausalLM(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def make_inputs():
    rng = np.random.RandomState(0)
    patches = rng.randn(2, 3, 48).astype(np.float32)   # 3 patches of 4*4*3
    ids = np.array([[IMAGE_TOKEN, IMAGE_TOKEN, IMAGE_TOKEN, 5, 9, 11],
                    [IMAGE_TOKEN, IMAGE_TOKEN, IMAGE_TOKEN, 7, 3, 2]], dtype=np.int64)
    mask = np.ones_like(ids)
    return patches, ids, mask


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "fuyu")
    tm = make_tiny(d)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    patches, ids, mask = make_inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 image_patches=torch.tensor(patches),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                image_patches=jnp.asarray(patches),
                attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "fuyu-gen")
    tm = make_tiny(d)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    patches, ids, mask = make_inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids),
                          image_patches=torch.tensor(patches),
                          attention_mask=torch.tensor(mask), max_new_tokens=6,
                          do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    image_patches=jnp.asarray(patches),
                                    attention_mask=jnp.asarray(mask),
                                    max_new_tokens=6,
                                    prompt_pad_multiple=ids.shape[1]))
    np.testing.assert_array_equal(out[:, :ref.shape[1]], ref)
