"""Pix2Struct parity vs torch: flattened-patch vision encoder + T5-flavored
text decoder, forward logits + greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.Pix2StructConfig(
        text_config=dict(vocab_size=99, hidden_size=32, d_kv=8, d_ff=64,
                         num_layers=2, num_heads=4,
                         relative_attention_num_buckets=8,
                         relative_attention_max_distance=16),
        vision_config=dict(hidden_size=32, patch_embed_hidden_size=12, d_ff=64,
                           d_kv=8, num_hidden_layers=2, num_attention_heads=4,
                           seq_len=32),
        attn_implementation="eager")
    tm = transformers.Pix2StructForConditionalGeneration(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def make_inputs():
    rng = np.random.RandomState(0)
    # flattened patches: [b, seq, 2 + patch_dim]; first two lanes row/col ids
    patches = rng.randn(2, 6, 14).astype(np.float32)
    patches[:, :, 0] = np.array([1, 1, 1, 2, 2, 2])
    patches[:, :, 1] = np.array([1, 2, 3, 1, 2, 3])
    patches[1, 4:] = 0.0  # padding patches
    mask = (patches.sum(-1) != 0).astype(np.int64)
    dec = np.array([[0, 5, 9], [0, 7, 11]], dtype=np.int64)
    return patches, mask, dec


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "p2s")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    patches, mask, dec = make_inputs()
    with torch.no_grad():
        ref = tm(flattened_patches=torch.tensor(patches),
                 attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = model(model.params, flattened_patches=jnp.asarray(patches),
                attention_mask=jnp.asarray(mask), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "p2s-gen")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    patches, mask, _ = make_inputs()
    with torch.no_grad():
        ref = tm.generate(flattened_patches=torch.tensor(patches),
                          attention_mask=torch.tensor(mask), max_new_tokens=6,
                          do_sample=False, num_beams=1).numpy()
    out = np.asarray(model.generate(model.params,
                                    flattened_patches=jnp.asarray(patches),
                                    attention_mask=jnp.asarray(mask),
                                    max_new_tokens=6))
    n = ref.shape[1]
    np.testing.assert_array_equal(out[:, :n], ref)
