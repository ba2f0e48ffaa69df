"""LayoutLMv3 parity vs torch: text+bbox, text+image joint sequence, heads."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

CFG = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
           num_attention_heads=4, intermediate_size=64,
           max_position_embeddings=64, coordinate_size=4, shape_size=8,
           input_size=32, patch_size=16, rel_pos_bins=8, max_rel_pos=16,
           rel_2d_pos_bins=8, max_rel_2d_pos=32,
           hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)

IDS = np.array([[4, 17, 9, 3, 22, 7, 14, 2], [5, 12, 9, 3, 1, 1, 1, 1]])
MASK = (IDS != 1).astype(np.int64)
rng = np.random.default_rng(0)
X0 = rng.integers(0, 500, IDS.shape)
Y0 = rng.integers(0, 500, IDS.shape)
BBOX = np.stack([X0, Y0, X0 + rng.integers(1, 400, IDS.shape),
                 Y0 + rng.integers(1, 400, IDS.shape)], axis=-1)
PIXELS = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)


def build(tmp_path, cls_name="LayoutLMv3Model", **over):
    import torch
    import transformers

    cfg = transformers.LayoutLMv3Config(**{**CFG, **over})
    torch.manual_seed(0)
    tm = getattr(transformers, cls_name)(cfg).eval()
    d = str(tmp_path)
    tm.save_pretrained(d, safe_serialization=True)
    import transformers_tpu.models.layoutlmv3 as mod

    m = getattr(mod, cls_name).from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    return tm, m


def test_text_only_forward(tmp_path):
    import torch

    tm, m = build(tmp_path / "a")
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS), bbox=torch.from_numpy(BBOX),
                 attention_mask=torch.from_numpy(MASK)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), bbox=jnp.asarray(BBOX),
            attention_mask=jnp.asarray(MASK)).last_hidden_state
    assert max_abs_diff(out, ref) < 1e-4, max_abs_diff(out, ref)


def test_text_plus_image_forward(tmp_path):
    import torch

    tm, m = build(tmp_path / "b")
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS), bbox=torch.from_numpy(BBOX),
                 attention_mask=torch.from_numpy(MASK),
                 pixel_values=torch.from_numpy(PIXELS)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), bbox=jnp.asarray(BBOX),
            attention_mask=jnp.asarray(MASK),
            pixel_values=jnp.asarray(PIXELS)).last_hidden_state
    assert out.shape == ref.shape  # 8 text + 5 visual (2x2 patches + cls)
    assert max_abs_diff(out, ref) < 1e-4, max_abs_diff(out, ref)


@pytest.mark.parametrize("cls_name,labels", [
    ("LayoutLMv3ForTokenClassification", 5),
    ("LayoutLMv3ForTokenClassification", 12),
    ("LayoutLMv3ForSequenceClassification", 3),
    ("LayoutLMv3ForQuestionAnswering", 2),
])
def test_heads(tmp_path, cls_name, labels):
    import torch

    tm, m = build(tmp_path / f"h{cls_name}{labels}", cls_name=cls_name,
                  num_labels=labels)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS), bbox=torch.from_numpy(BBOX),
                 attention_mask=torch.from_numpy(MASK))
    out = m(m.params, input_ids=jnp.asarray(IDS), bbox=jnp.asarray(BBOX),
            attention_mask=jnp.asarray(MASK))
    if cls_name == "LayoutLMv3ForQuestionAnswering":
        assert max_abs_diff(out.start_logits, ref.start_logits.numpy()) < 1e-4
        assert max_abs_diff(out.end_logits, ref.end_logits.numpy()) < 1e-4
    else:
        assert max_abs_diff(out.logits, ref.logits.numpy()) < 1e-4
