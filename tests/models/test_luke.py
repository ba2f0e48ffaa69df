"""LUKE parity vs torch: entity-aware attention, span-pooled entity
embeddings, joint word/entity encoding."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.mark.parametrize("eaa", [True, False])
def test_luke_parity(tmp_path, eaa):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LukeConfig(
        vocab_size=99, entity_vocab_size=50, entity_emb_size=16, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=64, use_entity_aware_attention=eaa)
    tm = transformers.LukeModel(cfg).eval()
    d = str(tmp_path / f"luke{eaa}")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[3, 17, 9, 42, 7, 1], [5, 2, 8, 4, 1, 1]])
    mask = np.array([[1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 0, 0]])
    ent_ids = np.array([[2, 4], [7, 0]])
    ent_mask = np.array([[1, 1], [1, 0]])
    ent_pos = np.full((2, 2, 4), -1)
    ent_pos[0, 0, :2] = [1, 2]
    ent_pos[0, 1, :1] = [3]
    ent_pos[1, 0, :3] = [0, 1, 2]
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 entity_ids=torch.tensor(ent_ids),
                 entity_attention_mask=torch.tensor(ent_mask),
                 entity_position_ids=torch.tensor(ent_pos))
    out = m(m.params, input_ids=ids, attention_mask=mask, entity_ids=ent_ids,
            entity_attention_mask=ent_mask, entity_position_ids=ent_pos)
    assert max_abs_diff(out.last_hidden_state,
                        ref.last_hidden_state.numpy()) < 3e-5
    assert max_abs_diff(out.entity_last_hidden_state,
                        ref.entity_last_hidden_state.numpy()) < 3e-5
    assert max_abs_diff(out.pooler_output, ref.pooler_output.numpy()) < 3e-5
