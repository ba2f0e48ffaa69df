"""BridgeTower parity vs torch: bridged dual towers + cross-modal fusion."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers):
    return transformers.BridgeTowerConfig(
        text_config=dict(vocab_size=99, hidden_size=64, num_hidden_layers=4,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=64, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0),
        vision_config=dict(hidden_size=64, num_hidden_layers=4, patch_size=8,
                           image_size=32),
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        contrastive_hidden_size=16)


def _inputs():
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(2, 99, size=(2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0
    ids[1, 5:] = 1  # pad token
    return px, ids, mask


def test_bridgetower_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.BridgeTowerModel(_cfg(transformers)).eval()
    d = str(tmp_path / "bt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px, ids, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=ids, pixel_values=px, attention_mask=mask)
    assert max_abs_diff(out.text_features, ref.text_features.numpy()) < 5e-5
    assert max_abs_diff(out.image_features, ref.image_features.numpy()) < 5e-5
    assert max_abs_diff(out.pooler_output, ref.pooler_output.numpy()) < 5e-5


def test_bridgetower_itm_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.BridgeTowerForImageAndTextRetrieval(_cfg(transformers)).eval()
    d = str(tmp_path / "bt_itm")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.bridgetower import BridgeTowerForImageAndTextRetrieval
    m = BridgeTowerForImageAndTextRetrieval.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px, ids, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    out = m(m.params, input_ids=ids, pixel_values=px,
            attention_mask=mask).logits
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)
