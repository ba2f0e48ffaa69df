"""RNNT/TDT loss parity vs independent oracles.

Oracles are deliberately a DIFFERENT algorithm from the implementation:
exhaustive enumeration of every alignment path (tiny lattices) and a direct
cell-by-cell numpy DP (larger lattices). The implementation uses an
associative-scan / wavefront formulation, so agreement is meaningful.
Reference semantics: /root/reference loss/loss_rnnt.py:23, loss/loss_tdt.py:23.
"""

import sys
from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.loss.transducer import rnnt_loss, tdt_loss  # noqa: E402


def _log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def _rnnt_enum_oracle(logits, targets, T, U):
    """Sum of every alignment path's probability, by brute-force recursion."""
    lp = _log_softmax(np.asarray(logits, np.float64))

    def paths(t, u):
        # returns list of log-probs of all completions from lattice cell (t, u)
        if t == T - 1 and u == U:
            return [lp[t, u, BLANK]]
        out = []
        if t < T - 1:
            for rest in paths(t + 1, u):
                out.append(lp[t, u, BLANK] + rest)
        if u < U:
            for rest in paths(t, u + 1):
                out.append(lp[t, u, targets[u]] + rest)
        return out

    from scipy.special import logsumexp
    return -logsumexp(paths(0, 0))


def _rnnt_dp_oracle(logits, targets, T, U):
    """Direct cell-by-cell DP (textbook recursion, no scan tricks)."""
    lp = _log_softmax(np.asarray(logits, np.float64))
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, BLANK])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, targets[u - 1]])
            if cands:
                alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + lp[T - 1, U, BLANK])


BLANK = 0
V = 5


def _rand_rnnt(b, t_max, u_max, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, t_max, u_max + 1, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(b, u_max)).astype(np.int32)
    return logits, targets


def test_rnnt_matches_exhaustive_enumeration():
    pytest.importorskip("scipy")
    b, t_max, u_max = 3, 4, 2
    logits, targets = _rand_rnnt(b, t_max, u_max, seed=1)
    tl = np.array([4, 3, 2], np.int32)
    ul = np.array([2, 1, 2], np.int32)
    got = rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(tl),
                    jnp.asarray(ul), BLANK, reduction="none")
    for i in range(b):
        want = _rnnt_enum_oracle(logits[i, :tl[i], :ul[i] + 1], targets[i], int(tl[i]), int(ul[i]))
        np.testing.assert_allclose(float(got[i]), want, rtol=2e-5)


def test_rnnt_matches_dp_oracle_ragged():
    b, t_max, u_max = 4, 12, 6
    logits, targets = _rand_rnnt(b, t_max, u_max, seed=2)
    tl = np.array([12, 7, 9, 1], np.int32)
    ul = np.array([6, 3, 0, 0], np.int32)
    got = rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(tl),
                    jnp.asarray(ul), BLANK, reduction="none")
    for i in range(b):
        want = _rnnt_dp_oracle(logits[i, :tl[i], :ul[i] + 1], targets[i], int(tl[i]), int(ul[i]))
        np.testing.assert_allclose(float(got[i]), want, rtol=2e-5)


def test_rnnt_reductions_and_grads():
    b, t_max, u_max = 2, 6, 3
    logits, targets = _rand_rnnt(b, t_max, u_max, seed=3)
    tl, ul = jnp.asarray([6, 5]), jnp.asarray([3, 2])
    per = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), tl, ul, BLANK,
                               reduction="none"))
    for red, want in [("sum", per.sum()), ("mean_batch", per.mean()),
                      ("mean_volume", per.sum() / 5.0),
                      ("mean", (per / np.array([3.0, 2.0])).mean())]:
        got = rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), tl, ul, BLANK, reduction=red)
        np.testing.assert_allclose(float(got), want, rtol=1e-6)
    g = jax.grad(lambda x: rnnt_loss(x, jnp.asarray(targets), tl, ul, BLANK))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
    with pytest.raises(ValueError):
        rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), tl, ul, BLANK, reduction="avg")


DURS = (0, 1, 2)


def _tdt_enum_oracle(tok, dur, targets, T, U, sigma=0.0):
    """Exhaustive TDT path enumeration (reference loss/loss_tdt.py semantics:
    blank arcs advance t by dur>0; label arcs advance (t by dur, u by 1);
    terminal blank arc lands exactly at t == T from u == U)."""
    tlp = _log_softmax(np.asarray(tok, np.float64)) - sigma
    dlp = _log_softmax(np.asarray(dur, np.float64))
    out = []

    def go(t, u, acc):
        for i, d in enumerate(DURS):
            if d > 0 and u == U and t + d == T:
                out.append(acc + tlp[t, u, BLANK] + dlp[t, u, i])
            if d > 0 and t + d <= T - 1:
                go(t + d, u, acc + tlp[t, u, BLANK] + dlp[t, u, i])
            if u < U and t + d <= T - 1:
                go(t + d, u + 1, acc + tlp[t, u, targets[u]] + dlp[t, u, i])

    go(0, 0, 0.0)
    from scipy.special import logsumexp
    return -logsumexp(out)


def _rand_tdt(b, t_max, u_max, seed=0):
    rng = np.random.default_rng(seed)
    tok = rng.normal(size=(b, t_max, u_max + 1, V + 1)).astype(np.float32)
    dur = rng.normal(size=(b, t_max, u_max + 1, len(DURS))).astype(np.float32)
    targets = rng.integers(1, V, size=(b, u_max)).astype(np.int32)
    return tok, dur, targets


@pytest.mark.parametrize("sigma", [0.0, 0.05])
def test_tdt_matches_exhaustive_enumeration(sigma):
    pytest.importorskip("scipy")
    b, t_max, u_max = 3, 5, 2
    tok, dur, targets = _rand_tdt(b, t_max, u_max, seed=4)
    tl = np.array([5, 4, 3], np.int32)
    ul = np.array([2, 1, 0], np.int32)
    got = tdt_loss(jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(targets),
                   jnp.asarray(tl), jnp.asarray(ul), BLANK, DURS, sigma=sigma,
                   reduction="none")
    for i in range(b):
        want = _tdt_enum_oracle(tok[i, :tl[i], :ul[i] + 1], dur[i, :tl[i], :ul[i] + 1],
                                targets[i], int(tl[i]), int(ul[i]), sigma=sigma)
        np.testing.assert_allclose(float(got[i]), want, rtol=2e-5)


def test_tdt_grads_finite():
    tok, dur, targets = _rand_tdt(2, 6, 3, seed=5)
    tl, ul = jnp.asarray([6, 4]), jnp.asarray([3, 2])

    def f(t, d):
        return tdt_loss(t, d, jnp.asarray(targets), tl, ul, BLANK, DURS, reduction="mean")

    gt, gd = jax.grad(f, argnums=(0, 1))(jnp.asarray(tok), jnp.asarray(dur))
    assert np.isfinite(np.asarray(gt)).all() and np.isfinite(np.asarray(gd)).all()
    assert float(jnp.abs(gd).max()) > 0
