"""Transducer losses: RNN-T and TDT (Token-and-Duration Transducer).

TPU-native formulations of the reference's ``loss/loss_rnnt.py`` (a
torchaudio wrapper) and ``loss/loss_tdt.py`` (NeMo-style anti-diagonal DP):

- ``rnnt_loss``: the O(T·U) lattice is computed with a ``lax.scan`` over
  encoder time only; the within-row recursion over target positions is a
  log-semiring *prefix sum* — ``alpha[t, u] = L[u] + logcumsumexp(alpha[t-1]
  + blank[t-1] - L)[u]`` where ``L`` is the cumulative label log-prob along
  row ``t`` — evaluated with ``lax.associative_scan`` so each scan step is
  one vectorized wavefront instead of a U-length Python loop.
- ``tdt_loss``: anti-diagonal wavefront scan (all ``(t, u)`` with ``t+u=n``
  updated per step), durations unrolled statically.

Both run in float32, mask with a large finite negative (``-inf`` arithmetic
poisons gradients under jit), and support per-sample ragged
``logit_lengths``/``target_lengths``. Reductions mirror NeMo's ``RNNTLoss``
(reference loss/loss_rnnt.py:39-44): mean_volume / mean_batch / mean / sum /
none.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

NEG = -1.0e9  # effective -inf that stays NaN-free through cumsums/grads

_REDUCTIONS = ("mean_volume", "mean_batch", "mean", "sum", "none")


def _reduce(losses: jnp.ndarray, target_lengths: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction not in _REDUCTIONS:
        raise ValueError(f'Invalid reduction mode "{reduction}". Expected one of {_REDUCTIONS}.')
    tl = target_lengths.astype(jnp.float32)
    if reduction == "mean_volume":
        return jnp.sum(losses) / jnp.sum(tl)
    if reduction == "mean_batch":
        return jnp.mean(losses)
    if reduction == "mean":
        return jnp.mean(losses / tl)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses


def rnnt_loss(
    logits: jnp.ndarray,          # [B, T, U+1, V] joint logits
    targets: jnp.ndarray,         # [B, U] int labels
    logit_lengths: jnp.ndarray,   # [B]
    target_lengths: jnp.ndarray,  # [B]
    blank_token_id: int,
    reduction: str = "mean_volume",
) -> jnp.ndarray:
    """Negative log-likelihood of the RNN-T alignment lattice (Graves 2012).

    Matches ``torchaudio.functional.rnnt_loss`` semantics as wrapped by the
    reference (loss/loss_rnnt.py:23-88), including the NeMo reduction names.
    """
    logits = logits.astype(jnp.float32)
    b, t_max, u1, _ = logits.shape
    u_max = u1 - 1
    lp = jax.nn.log_softmax(logits, axis=-1)
    blank_lp = lp[..., blank_token_id]                            # [B, T, U+1]
    if u_max > 0:
        label_lp = jnp.take_along_axis(
            lp[:, :, :u_max, :], targets[:, None, :, None].astype(jnp.int32), axis=3
        )[..., 0]                                                  # [B, T, U]
        # labels at/after each sample's target length are unreachable
        u_ids = jnp.arange(u_max)[None, None, :]
        label_lp = jnp.where(u_ids < target_lengths[:, None, None], label_lp, NEG)
    else:
        label_lp = jnp.zeros((b, t_max, 0), jnp.float32)

    def row_cum_label(label_row):                                  # [B, U] -> [B, U+1]
        return jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32), jnp.cumsum(label_row, axis=-1)], axis=-1)

    final_u = target_lengths.astype(jnp.int32)[:, None]            # [B, 1]

    alpha0 = row_cum_label(label_lp[:, 0])                         # row t=0: labels only
    f0 = (jnp.take_along_axis(alpha0, final_u, axis=1)
          + jnp.take_along_axis(blank_lp[:, 0], final_u, axis=1))[:, 0]

    def step(alpha_prev, xs):
        label_row, blank_prev, blank_row = xs
        big_l = row_cum_label(label_row)                           # [B, U+1]
        c = alpha_prev + blank_prev - big_l
        m = jax.lax.associative_scan(jnp.logaddexp, c, axis=1)     # logcumsumexp
        alpha = big_l + m
        f = (jnp.take_along_axis(alpha, final_u, axis=1)
             + jnp.take_along_axis(blank_row, final_u, axis=1))[:, 0]
        return alpha, f

    if t_max > 1:
        xs = (jnp.swapaxes(label_lp[:, 1:], 0, 1),
              jnp.swapaxes(blank_lp[:, :-1], 0, 1),
              jnp.swapaxes(blank_lp[:, 1:], 0, 1))
        _, fs = jax.lax.scan(step, alpha0, xs)                     # [T-1, B]
        f_all = jnp.concatenate([f0[None], fs], axis=0)            # [T, B]
    else:
        f_all = f0[None]
    ll = jnp.take_along_axis(f_all, (logit_lengths.astype(jnp.int32) - 1)[None, :], axis=0)[0]
    return _reduce(-ll, target_lengths, reduction)


def tdt_loss(
    token_logits: jnp.ndarray,     # [B, T, U+1, V+1]
    duration_logits: jnp.ndarray,  # [B, T, U+1, D]
    targets: jnp.ndarray,          # [B, U]
    logit_lengths: jnp.ndarray,    # [B]
    target_lengths: jnp.ndarray,   # [B]
    blank_token_id: int,
    durations: Sequence[int],
    sigma: float = 0.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """TDT loss (https://arxiv.org/abs/2304.06795); reference loss/loss_tdt.py:23.

    Anti-diagonal wavefront: every ``(t, u)`` with ``t + u = n`` is updated in
    one vectorized step (the arcs into diagonal ``n`` leave from strictly
    earlier diagonals), durations statically unrolled.
    """
    token_logits = token_logits.astype(jnp.float32)
    duration_logits = duration_logits.astype(jnp.float32)
    b, t_max, u1, _ = token_logits.shape
    u_max = u1 - 1
    durations = list(durations)

    token_lp = jax.nn.log_softmax(token_logits, axis=-1) - sigma
    dur_lp = jax.nn.log_softmax(duration_logits, axis=-1)          # [B, T, U+1, D]
    blank_lp = token_lp[..., blank_token_id]                       # [B, T, U+1]
    if u_max > 0:
        label_lp = jnp.take_along_axis(
            token_lp[:, :, :u_max, :], targets[:, None, :, None].astype(jnp.int32), axis=3
        )[..., 0]                                                  # [B, T, U]
        label_lp = jnp.pad(label_lp, ((0, 0), (0, 0), (0, 1)), constant_values=NEG)
    else:
        label_lp = jnp.full((b, t_max, 1), NEG, jnp.float32)

    u_ids = jnp.arange(u1)                                         # [U+1]

    def diag_step(alpha, n):
        # positions on diagonal n: t = n - u (valid where 0 <= t < T)
        t_idx = n - u_ids                                          # [U+1]
        t_ok = (t_idx >= 0) & (t_idx < t_max)
        cands = []
        for i, dur in enumerate(durations):
            t_src = jnp.clip(t_idx - dur, 0, t_max - 1)            # [U+1]
            src_ok = (t_idx - dur >= 0) & t_ok
            gather_t = jnp.broadcast_to(t_src[None, None, :], (b, 1, u1))
            a_same = jnp.take_along_axis(alpha, gather_t, axis=1)[:, 0]      # [B,U+1] at (t-dur, u)
            blank_s = jnp.take_along_axis(blank_lp, gather_t, axis=1)[:, 0]
            dur_s = jnp.take_along_axis(
                dur_lp[..., i], gather_t, axis=1)[:, 0]
            if dur > 0:  # blank arc (t-dur, u) -> (t, u)
                contrib = a_same + blank_s + dur_s
                cands.append(jnp.where(src_ok[None, :], contrib, NEG))
            # label arc (t-dur, u-1) -> (t, u): source cell is (t_src[u], u-1),
            # whose time index differs per column — gather FLAT (t, u) pairs
            # (a column-reindex of the diagonal gather would read
            # alpha[t_src[u-1], u-1], the wrong time row).
            u_src = jnp.clip(u_ids - 1, 0, u_max)
            lbl_ok = src_ok & (u_ids > 0)
            flat_idx = jnp.broadcast_to((t_src * u1 + u_src)[None, :], (b, u1))
            a_prev = jnp.take_along_axis(alpha.reshape(b, -1), flat_idx, axis=1)
            lbl_s = jnp.take_along_axis(label_lp.reshape(b, -1), flat_idx, axis=1)
            dur_prev = jnp.take_along_axis(dur_lp[..., i].reshape(b, -1), flat_idx, axis=1)
            contrib = a_prev + lbl_s + dur_prev
            cands.append(jnp.where(lbl_ok[None, :], contrib, NEG))
        stacked = jnp.stack(cands, axis=0)                         # [C, B, U+1]
        new_vals = jax.scipy.special.logsumexp(stacked, axis=0)    # [B, U+1]
        # scatter the diagonal back (only valid lattice cells)
        t_w = jnp.clip(t_idx, 0, t_max - 1)
        cur = jnp.take_along_axis(alpha, jnp.broadcast_to(t_w[None, None, :], (b, 1, u1)), axis=1)[:, 0]
        upd = jnp.where(t_ok[None, :], new_vals, cur)
        flat = alpha.reshape(b, t_max * u1)
        pos = t_w * u1 + u_ids                                     # [U+1]
        flat = flat.at[:, pos].set(jnp.where(t_ok[None, :], upd,
                                             jnp.take_along_axis(flat, jnp.broadcast_to(pos[None, :], (b, u1)), axis=1)))
        return flat.reshape(b, t_max, u1), None

    alpha = jnp.full((b, t_max, u1), NEG, jnp.float32).at[:, 0, 0].set(0.0)
    alpha, _ = jax.lax.scan(diag_step, alpha, jnp.arange(1, t_max + u1 - 1))

    # terminal: blank arcs from (T-dur, U) past the end of the lattice
    tl = target_lengths.astype(jnp.int32)
    ll = jnp.full((b,), NEG, jnp.float32)
    bidx = jnp.arange(b)
    for i, dur in enumerate(durations):
        if dur == 0:
            continue
        t_fin = logit_lengths.astype(jnp.int32) - dur
        ok = t_fin >= 0
        t_c = jnp.clip(t_fin, 0, t_max - 1)
        term = (alpha[bidx, t_c, tl] + blank_lp[bidx, t_c, tl]
                + dur_lp[bidx, t_c, tl, i])
        ll = jnp.where(ok, jnp.logaddexp(ll, term), ll)
    return _reduce(-ll, target_lengths, reduction)
