"""Loss library (reference src/transformers/loss/loss_utils.py:49-149).

Pure-jnp losses with the reference's ignore-index semantics (-100). All
computed in float32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, *, ignore_index: int = IGNORE_INDEX) -> jnp.ndarray:
    """Mean token-level CE over non-ignored labels. logits [N, V], labels [N]."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def for_causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray, vocab_size: int,
                       *, ignore_index: int = IGNORE_INDEX,
                       shift_labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """reference loss/loss_utils.py:49 ``ForCausalLMLoss`` — shift-by-one CE."""
    if shift_labels is None:
        shift_logits = logits[:, :-1, :]
        shift_labels = labels[:, 1:]
    else:
        shift_logits = logits
    return cross_entropy(shift_logits.reshape(-1, vocab_size), shift_labels.reshape(-1),
                         ignore_index=ignore_index)


def for_masked_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray, vocab_size: int,
                       *, ignore_index: int = IGNORE_INDEX) -> jnp.ndarray:
    return cross_entropy(logits.reshape(-1, vocab_size), labels.reshape(-1), ignore_index=ignore_index)


def for_sequence_classification_loss(logits: jnp.ndarray, labels: jnp.ndarray, config) -> jnp.ndarray:
    """reference loss/loss_utils.py ForSequenceClassificationLoss — regression /
    single-label / multi-label dispatch via config.problem_type."""
    num_labels = config.num_labels
    problem_type = getattr(config, "problem_type", None)
    if problem_type is None:
        if num_labels == 1:
            problem_type = "regression"
        elif labels.dtype in (jnp.int32, jnp.int64):
            problem_type = "single_label_classification"
        else:
            problem_type = "multi_label_classification"
    logits32 = logits.astype(jnp.float32)
    if problem_type == "regression":
        return jnp.mean(jnp.square(logits32.squeeze() - labels.astype(jnp.float32).squeeze()))
    if problem_type == "single_label_classification":
        return cross_entropy(logits32.reshape(-1, num_labels), labels.reshape(-1))
    # multi-label: sigmoid BCE
    labels32 = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits32)
    log_not_p = jax.nn.log_sigmoid(-logits32)
    return -jnp.mean(labels32 * log_p + (1.0 - labels32) * log_not_p)


def for_token_classification_loss(logits: jnp.ndarray, labels: jnp.ndarray, config) -> jnp.ndarray:
    return cross_entropy(logits.reshape(-1, config.num_labels), labels.reshape(-1))


def for_question_answering_loss(start_logits, end_logits, start_positions, end_positions) -> jnp.ndarray:
    seq_len = start_logits.shape[1]
    start_positions = jnp.clip(start_positions, 0, seq_len)
    end_positions = jnp.clip(end_positions, 0, seq_len)
    start_loss = cross_entropy(start_logits, start_positions, ignore_index=seq_len)
    end_loss = cross_entropy(end_logits, end_positions, ignore_index=seq_len)
    return (start_loss + end_loss) / 2.0
