"""GIT image-captioning parity: CLIP tower + image-prefixed text decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_forward_logit_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GitConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=16, patch_size=8,
                           projection_dim=24),
        hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, vocab_size=99, max_position_embeddings=64)
    tm = transformers.GitForCausalLM(cfg).eval()
    d = str(tmp_path / "git")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ids = np.array([[90, 7, 9, 4]])
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pixels)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixels)).logits
    # torch returns logits for the text region only
    s_t = ids.shape[1]
    assert max_abs_diff(np.asarray(out)[:, -s_t:], ref[:, -s_t:]) < 5e-5

    # text-only path
    with torch.no_grad():
        ref2 = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out2 = m(m.params, input_ids=jnp.asarray(ids)).logits
    assert max_abs_diff(np.asarray(out2)[:, -s_t:], ref2[:, -s_t:]) < 5e-5
