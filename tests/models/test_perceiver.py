"""Perceiver parity vs torch: masked LM, sequence classification,
learned-position image classification."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

CFG = dict(num_latents=8, d_latents=32, d_model=24, num_blocks=2,
           num_self_attends_per_block=2, num_self_attention_heads=4,
           num_cross_attention_heads=2, vocab_size=99,
           max_position_embeddings=16, image_size=8,
           attention_probs_dropout_prob=0.0)

IDS = np.array([[4, 17, 9, 3, 22, 7, 14, 2, 11, 5, 8, 19, 6, 13, 21, 9],
                [5, 12, 9, 3, 1, 7, 2, 4, 18, 6, 2, 8, 15, 3, 9, 11]])


def build(tmp_path, cls_name, **over):
    import torch
    import transformers

    cfg = transformers.PerceiverConfig(**{**CFG, **over})
    torch.manual_seed(0)
    tm = getattr(transformers, cls_name)(cfg).eval()
    d = str(tmp_path)
    tm.save_pretrained(d, safe_serialization=True)
    import transformers_tpu.models.perceiver as mod

    m = getattr(mod, cls_name).from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    return tm, m


def test_masked_lm(tmp_path):
    import torch

    tm, m = build(tmp_path / "mlm", "PerceiverForMaskedLM")
    with torch.no_grad():
        ref = tm(inputs=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, inputs=jnp.asarray(IDS)).logits
    assert out.shape == ref.shape
    assert max_abs_diff(out, ref) < 1e-4, max_abs_diff(out, ref)


def test_sequence_classification(tmp_path):
    import torch

    tm, m = build(tmp_path / "cls", "PerceiverForSequenceClassification", num_labels=5)
    with torch.no_grad():
        ref = tm(inputs=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, inputs=jnp.asarray(IDS)).logits
    assert max_abs_diff(out, ref) < 1e-4


def test_image_classification_learned(tmp_path):
    import torch

    tm, m = build(tmp_path / "img", "PerceiverForImageClassificationLearned",
                  num_labels=5)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm(inputs=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, inputs=jnp.asarray(px)).logits
    assert max_abs_diff(out, ref) < 1e-4
