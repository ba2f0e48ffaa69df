"""ESM-1b/ESM-2 protein LM parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CASES = {
    "esm1b-style": dict(position_embedding_type="absolute", emb_layer_norm_before=True,
                        token_dropout=False),
    "esm2-style": dict(position_embedding_type="rotary", emb_layer_norm_before=False,
                       token_dropout=True),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_mlm_logit_parity(case, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.EsmConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, pad_token_id=1,
        mask_token_id=32, attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        **CASES[case])
    tm = transformers.EsmForMaskedLM(cfg).eval()
    d = str(tmp_path / case)
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[0, 5, 9, 32, 22, 7, 14, 2], [0, 8, 32, 2, 1, 1, 1, 1]])
    mask = np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]])
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits
    assert max_abs_diff(out, ref) < 5e-5, case
