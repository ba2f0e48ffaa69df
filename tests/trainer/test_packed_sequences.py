"""Packed-sequence (padding-free) training path: flattening collator +
segment-id masks. Reference: data_collator.py DataCollatorWithFlattening +
masking_utils.py:182 packed-sequence mask."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from parity_utils import make_tiny_torch_llama  # noqa: E402
from transformers_tpu import DataCollatorWithFlattening  # noqa: E402
from transformers_tpu.ops.masks import segment_ids_from_position_ids  # noqa: E402


def test_segment_ids_from_position_ids():
    pos = jnp.asarray([[0, 1, 2, 0, 1, 0, 1, 2, 3]])
    seg = np.asarray(segment_ids_from_position_ids(pos))
    np.testing.assert_array_equal(seg[0], [0, 0, 0, 1, 1, 2, 2, 2, 2])
    # plain arange -> single segment
    seg2 = np.asarray(segment_ids_from_position_ids(jnp.arange(6)[None]))
    np.testing.assert_array_equal(seg2[0], [0] * 6)


def test_flattening_collator():
    feats = [
        {"input_ids": [5, 6, 7]},
        {"input_ids": [8, 9]},
    ]
    batch = DataCollatorWithFlattening()(feats)
    np.testing.assert_array_equal(batch["input_ids"][0], [5, 6, 7, 8, 9])
    np.testing.assert_array_equal(batch["position_ids"][0], [0, 1, 2, 0, 1])
    np.testing.assert_array_equal(batch["labels"][0], [-100, 6, 7, -100, 9])

    padded = DataCollatorWithFlattening(pad_to_multiple_of=8, pad_token_id=0)(feats)
    assert padded["input_ids"].shape == (1, 8)
    np.testing.assert_array_equal(padded["labels"][0, 5:], [-100, -100, -100])
    # pad region restarts positions -> its own segment
    seg = np.asarray(segment_ids_from_position_ids(jnp.asarray(padded["position_ids"])))
    assert seg[0, 5] == 2 and seg[0, 4] == 1


def test_packed_forward_matches_separate(tmp_path):
    """Logits for two sequences packed into one row == two separate forwards
    (block-diagonal mask prevents any cross-sequence leak)."""
    d = str(tmp_path / "ckpt")
    make_tiny_torch_llama(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")

    a = [3, 17, 9, 42]
    b = [7, 1, 25]
    packed_ids = jnp.asarray([a + b])
    packed_pos = jnp.asarray([[0, 1, 2, 3, 0, 1, 2]])
    out = m(m.params, input_ids=packed_ids, position_ids=packed_pos)

    la = m(m.params, input_ids=jnp.asarray([a])).logits
    lb = m(m.params, input_ids=jnp.asarray([b])).logits
    np.testing.assert_allclose(np.asarray(out.logits[0, :4]), np.asarray(la[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.logits[0, 4:]), np.asarray(lb[0]),
                               atol=2e-5)


def test_packed_loss_matches_padded(tmp_path):
    """Packed-row CLM loss == padded-batch CLM loss over the same examples."""
    d = str(tmp_path / "ckpt")
    make_tiny_torch_llama(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")

    feats = [{"input_ids": [3, 17, 9, 42, 11]}, {"input_ids": [7, 1, 25]}]
    packed = DataCollatorWithFlattening()(feats)
    out_p = m(m.params, input_ids=jnp.asarray(packed["input_ids"]),
              position_ids=jnp.asarray(packed["position_ids"]),
              labels=jnp.asarray(packed["labels"]))

    # padded equivalent: right-pad, labels -100 on pads
    ids = np.zeros((2, 5), np.int64)
    mask = np.zeros((2, 5), np.int64)
    labels = np.full((2, 5), -100, np.int64)
    for i, f in enumerate(feats):
        n = len(f["input_ids"])
        ids[i, :n] = f["input_ids"]
        mask[i, :n] = 1
        labels[i, 1:n] = f["input_ids"][1:]
    out_b = m(m.params, input_ids=jnp.asarray(ids),
              attention_mask=jnp.asarray(mask), labels=jnp.asarray(labels))
    np.testing.assert_allclose(float(out_p.loss), float(out_b.loss), rtol=1e-5)
