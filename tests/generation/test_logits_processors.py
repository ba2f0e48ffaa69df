"""New logits processors + watermarking."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.generation.logits_process import (  # noqa: E402
    EpsilonLogitsWarper,
    EtaLogitsWarper,
    LogitNormalization,
    NoBadWordsLogitsProcessor,
    TypicalLogitsWarper,
)
from transformers_tpu.generation.watermarking import (  # noqa: E402
    WatermarkDetector,
    WatermarkLogitsProcessor,
)


def _logits(seed=0, b=2, v=50):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(b, v)), jnp.float32)


def test_typical_warper_matches_reference():
    import torch
    from transformers.generation.logits_process import TypicalLogitsWarper as HF

    logits = _logits()
    ours = TypicalLogitsWarper(mass=0.8)(logits)
    theirs = HF(mass=0.8)(None, torch.tensor(np.asarray(logits))).numpy()
    ours_np = np.asarray(ours)
    np.testing.assert_array_equal(np.isneginf(ours_np), np.isneginf(theirs))
    np.testing.assert_allclose(np.where(np.isneginf(ours_np), 0, ours_np),
                               np.where(np.isneginf(theirs), 0, theirs), atol=1e-6)


def test_epsilon_eta_warpers_match_reference():
    import torch
    from transformers.generation.logits_process import (
        EpsilonLogitsWarper as HFEps,
        EtaLogitsWarper as HFEta,
    )

    logits = _logits(1)
    ours = EpsilonLogitsWarper(0.02)(logits)
    theirs = HFEps(0.02)(None, torch.tensor(np.asarray(logits))).numpy()
    np.testing.assert_array_equal(np.isneginf(np.asarray(ours)), np.isneginf(theirs))

    oe = EtaLogitsWarper(0.02)(logits)
    te = HFEta(0.02)(None, torch.tensor(np.asarray(logits))).numpy()
    np.testing.assert_array_equal(np.isneginf(np.asarray(oe)), np.isneginf(te))


def test_bad_words_single_and_multi():
    proc = NoBadWordsLogitsProcessor([[7], [3, 9]])
    logits = _logits(2)
    ids = jnp.asarray([[1, 3, 0, 0], [1, 2, 0, 0]], jnp.int32)
    state = {"ids": ids, "pos": jnp.asarray(2, jnp.int32), "gen_count": jnp.asarray(1)}
    out = np.asarray(proc(logits, state))
    assert np.isneginf(out[:, 7]).all()          # single banned everywhere
    assert np.isneginf(out[0, 9])                 # row 0 prefix [.., 3] matches
    assert not np.isneginf(out[1, 9])             # row 1 prefix [.., 2] doesn't


def test_logit_normalization():
    out = np.asarray(LogitNormalization()(_logits(3)))
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-5)


def test_watermark_bias_and_detection():
    vocab = 64
    proc = WatermarkLogitsProcessor(vocab, greenlist_ratio=0.25, bias=5.0)
    rng = np.random.default_rng(0)
    # generate a "watermarked" sequence by greedily following the green bias
    seq = [5]
    for _ in range(60):
        logits = jnp.asarray(rng.normal(size=(1, vocab)), jnp.float32)
        state = {"ids": jnp.asarray([seq + [0] * 10], jnp.int32),
                 "pos": jnp.asarray(len(seq), jnp.int32)}
        biased = proc(logits, state)
        seq.append(int(np.argmax(np.asarray(biased)[0])))
    detector = WatermarkDetector(proc)
    marked = detector.score(np.asarray(seq))
    unmarked = detector.score(rng.integers(0, vocab, size=len(seq)))
    assert marked["z_score"][0] > 4.0
    assert unmarked["z_score"][0] < 4.0
    assert marked["prediction"][0] and not unmarked["prediction"][0]
