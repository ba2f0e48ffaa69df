"""Wav2Vec2 parity vs torch: conv feature encoder (group + layer norm
variants), weight-normed positional conv, CTC logits + loss, sequence
classification pooling."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.models.wav2vec2 import (  # noqa: E402
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
)

TINY = dict(
    vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, conv_dim=(16, 32), conv_stride=(4, 2), conv_kernel=(8, 4),
    num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
    hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
)

AUDIO = np.random.default_rng(0).normal(size=(2, 400)).astype(np.float32)
MASK = np.concatenate([np.ones((2, 300), np.int64), np.zeros((2, 100), np.int64)], axis=1)
MASK[0, :] = 1


def make_torch(tmp_dir, cls_name, **over):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Wav2Vec2Config(**{**TINY, **over}, attn_implementation="eager")
    tm = getattr(transformers, cls_name)(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("norm,stable", [("group", False), ("layer", True)])
def test_ctc_logit_parity(norm, stable, tmp_path):
    import torch

    d = str(tmp_path / "w2v2")
    tm = make_torch(d, "Wav2Vec2ForCTC", feat_extract_norm=norm, do_stable_layer_norm=stable)
    m = Wav2Vec2ForCTC.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(AUDIO), attention_mask=torch.from_numpy(MASK)).logits
    out = m(m.params, input_values=jnp.asarray(AUDIO), attention_mask=jnp.asarray(MASK)).logits
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5)


def test_ctc_loss_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "w2v2_loss")
    tm = make_torch(d, "Wav2Vec2ForCTC", ctc_loss_reduction="mean")
    m = Wav2Vec2ForCTC.from_pretrained(d, dtype="float32")
    labels = np.array([[5, 9, 2, 7], [3, 1, -100, -100]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(AUDIO), attention_mask=torch.from_numpy(MASK),
                 labels=torch.from_numpy(labels)).loss
    out = m(m.params, input_values=jnp.asarray(AUDIO), attention_mask=jnp.asarray(MASK),
            labels=jnp.asarray(labels)).loss
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-4)


def test_sequence_classification_parity(tmp_path):
    import torch

    d = str(tmp_path / "w2v2_sc")
    tm = make_torch(d, "Wav2Vec2ForSequenceClassification")
    m = Wav2Vec2ForSequenceClassification.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm(torch.from_numpy(AUDIO), attention_mask=torch.from_numpy(MASK)).logits
    out = m(m.params, input_values=jnp.asarray(AUDIO), attention_mask=jnp.asarray(MASK)).logits
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5)
