"""Reformer parity vs torch: local+LSH attention (seeded hashes), axial
positions, chunk-multiple padding, masked batches, causal LM + greedy."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

CFG = dict(vocab_size=99, hidden_size=32, attention_head_size=8,
           num_attention_heads=2, feed_forward_size=64,
           attn_layers=["local", "lsh", "local", "lsh"],
           axial_pos_shape=[4, 8], axial_pos_embds_dim=[8, 24],
           local_attn_chunk_length=4, lsh_attn_chunk_length=4,
           local_num_chunks_before=1, local_num_chunks_after=0,
           lsh_num_chunks_before=1, lsh_num_chunks_after=0,
           num_buckets=4, num_hashes=2, hash_seed=7,
           max_position_embeddings=32, is_decoder=True,
           hidden_dropout_prob=0.0, local_attention_probs_dropout_prob=0.0,
           lsh_attention_probs_dropout_prob=0.0, eos_token_id=2, pad_token_id=0)


def build(tmp_path, cls_name="ReformerModelWithLMHead", **over):
    import torch
    import transformers

    cfg = transformers.ReformerConfig(**{**CFG, **over})
    torch.manual_seed(0)
    tm = getattr(transformers, cls_name)(cfg).eval()
    d = str(tmp_path)
    tm.save_pretrained(d, safe_serialization=True)
    import transformers_tpu.models.reformer as mod

    m = getattr(mod, cls_name).from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    return tm, m


IDS = np.array([[4, 17, 9, 3, 22, 7, 14, 2, 11, 5, 8, 19, 6, 13, 21, 9],
                [5, 12, 9, 3, 1, 7, 2, 4, 18, 6, 2, 8, 15, 3, 9, 11]])


def test_lm_forward_parity(tmp_path):
    import torch

    tm, m = build(tmp_path / "a")
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(out, ref) < 2e-4, max_abs_diff(out, ref)


def test_masked_and_padded_forward(tmp_path):
    """Non-chunk-multiple length triggers internal padding; explicit mask."""
    import torch

    tm, m = build(tmp_path / "b")
    ids = IDS[:, :13]
    mask = np.ones_like(ids)
    mask[1, 10:] = 0
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits
    assert out.shape == ref.shape
    # compare only positions valid under the mask
    diff = np.abs(np.asarray(out) - ref)
    assert diff[0].max() < 2e-4 and diff[1, :10].max() < 2e-4


def test_single_hash_and_factorized_buckets(tmp_path):
    import torch

    tm, m = build(tmp_path / "c", num_buckets=[2, 2], num_hashes=1)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(out, ref) < 2e-4


def test_encoder_model_and_masked_lm(tmp_path):
    import torch

    tm, m = build(tmp_path / "d", cls_name="ReformerForMaskedLM", is_decoder=False)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(out, ref) < 2e-4


def test_greedy_generate(tmp_path):
    import torch

    tm, m = build(tmp_path / "e")
    ids = IDS[:, :8]
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.from_numpy(ids), max_new_tokens=4,
                          do_sample=False, num_beams=1)
    got = np.asarray(m.generate(m.params, input_ids=ids, max_new_tokens=4))
    w = min(got.shape[1], ref.shape[1])
    assert np.array_equal(got[:, :w], ref.numpy()[:, :w]), (got, ref)
