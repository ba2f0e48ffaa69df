"""SynthID-Text watermarking parity vs the installed torch reference
(fixed keys/seeds): hashing, g-values, score tilting, repeated-context
bypass, and a detection round-trip."""

import sys
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.generation import (  # noqa: E402
    SynthIDTextWatermarkDetector,
    SynthIDTextWatermarkLogitsProcessor,
)

KW = dict(ngram_len=5, keys=[654, 400, 836, 123, 340, 443, 597, 160],
          sampling_table_size=2**16, sampling_table_seed=0,
          context_history_size=4)


def _ref():
    import torch

    return transformers.SynthIDTextWatermarkLogitsProcessor(
        **KW, device=torch.device("cpu"))


def test_g_values_parity():
    import torch

    ours = SynthIDTextWatermarkLogitsProcessor(**KW)
    theirs = _ref()
    ids = np.random.default_rng(0).integers(0, 1000, size=(3, 20))
    g_ours = ours.compute_g_values(ids)
    g_ref = theirs.compute_g_values(torch.tensor(ids)).numpy()
    np.testing.assert_array_equal(g_ours, g_ref)


def test_step_scores_parity():
    import torch

    ours = SynthIDTextWatermarkLogitsProcessor(**KW)
    theirs = _ref()
    rng = np.random.default_rng(1)
    vocab = 50
    ids = rng.integers(0, vocab, size=(2, 6))
    for step in range(5):
        scores = rng.normal(size=(2, vocab)).astype(np.float32)
        cur = np.concatenate([ids, rng.integers(0, vocab, size=(2, step))],
                             axis=1)
        o = ours(cur, scores)
        r = theirs(torch.tensor(cur), torch.tensor(scores)).numpy()
        np.testing.assert_allclose(o, r, atol=1e-5)


def test_repeated_context_bypass():
    """Feeding the same token repeatedly saturates the rolling context; once
    the context hash repeats, raw scores pass through unwatermarked."""
    ours = SynthIDTextWatermarkLogitsProcessor(**KW)
    scores = np.random.default_rng(2).normal(size=(1, 30)).astype(np.float32)
    ids = np.ones((1, 6), np.int64)
    outs = []
    for step in range(7):
        cur = np.concatenate([ids, np.ones((1, step), np.int64)], axis=1)
        outs.append(ours(cur, scores))
    # early steps watermark (contexts still varying)
    assert not np.allclose(outs[0], scores)
    # context saturates at all-ones after ngram_len-1 repeats; the repeat is
    # then detected and scores pass through raw
    np.testing.assert_array_equal(outs[-1], scores)


def test_detection_separates_watermarked_text():
    rng = np.random.default_rng(3)
    proc = SynthIDTextWatermarkLogitsProcessor(**KW)
    det = SynthIDTextWatermarkDetector(proc)
    vocab = 200
    # roll out 60 tokens greedily under watermarked vs raw logits
    ids_wm = list(rng.integers(0, vocab, size=4))
    ids_raw = list(ids_wm)
    proc_roll = SynthIDTextWatermarkLogitsProcessor(**KW)
    for _ in range(60):
        logits = rng.normal(scale=0.5, size=(1, vocab)).astype(np.float32)
        wm = proc_roll(np.asarray([ids_wm]), logits)
        ids_wm.append(int(np.argmax(wm)))
        ids_raw.append(int(np.argmax(logits)))
    s_wm = det(np.asarray([ids_wm]))
    s_raw = det(np.asarray([ids_raw]))
    assert s_wm["mean_g_values"][0] > s_raw["mean_g_values"][0]
    assert s_wm["z_score"][0] > 2.0
