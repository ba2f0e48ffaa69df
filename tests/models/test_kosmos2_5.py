"""KOSMOS-2.5 parity vs torch: Pix2Struct-style scaled vision encoder +
latent-query projection + segment-embedding text decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg():
    return transformers.Kosmos2_5Config(
        text_config=dict(vocab_size=150, max_position_embeddings=64,
                         embed_dim=32, layers=2, ffn_dim=64,
                         attention_heads=4, dropout=0.0),
        vision_config=dict(hidden_size=32, patch_embed_hidden_size=12,
                           intermediate_size=64, head_dim=8,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_num_patches=64),
        latent_query_num=5)


def test_kosmos2_5_parity(tmp_path):
    from transformers_tpu.models.kosmos2_5 import Kosmos2_5ForConditionalGeneration

    torch.manual_seed(0)
    tm = transformers.Kosmos2_5ForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "k25")
    tm.save_pretrained(d, safe_serialization=True)

    m = Kosmos2_5ForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    # 9 patches on a 3x3 grid; rows/cols in the first two lanes
    n_patch = 9
    fp = rng.random((1, n_patch, 14)).astype(np.float32)
    fp[0, :, 0] = np.repeat(np.arange(3), 3)
    fp[0, :, 1] = np.tile(np.arange(3), 3)
    ids = np.concatenate([[[0]], np.full((1, 5), 7), rng.integers(3, 149, (1, 6))],
                         axis=1).astype(np.int64)
    pos_mask = np.zeros_like(ids)
    pos_mask[0, 1:6] = 1  # latent_query_num image slots
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 flattened_patches=torch.from_numpy(fp),
                 image_embeds_position_mask=torch.from_numpy(pos_mask))
    out = m(m.params, input_ids=jnp.asarray(ids),
            flattened_patches=jnp.asarray(fp),
            image_embeds_position_mask=jnp.asarray(pos_mask))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4
