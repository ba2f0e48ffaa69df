"""MPNet parity vs torch: relative-bucket position bias encoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.mpnet import MPNetForMaskedLM  # noqa: E402


def test_mpnet_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.MPNetConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                   num_attention_heads=4, intermediate_size=64,
                                   max_position_embeddings=64)
    tm = transformers.MPNetForMaskedLM(cfg).eval()
    d = str(tmp_path / "mpnet")
    tm.save_pretrained(d, safe_serialization=True)
    m = MPNetForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[0, 17, 9, 42, 7, 2]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5
