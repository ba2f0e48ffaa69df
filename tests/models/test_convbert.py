"""ConvBERT parity vs torch: span-based dynamic convolution mixed attention."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 1, 1, 1, 1]],
               dtype=np.int64)
MASK = np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.int64)


def test_mlm_parity(tmp_path):
    import torch
    import transformers

    for num_groups in (1, 2):
        torch.manual_seed(0)
        config = transformers.ConvBertConfig(
            vocab_size=99, hidden_size=32, embedding_size=16,
            num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, head_ratio=2, conv_kernel_size=3,
            num_groups=num_groups, num_labels=3)
        tm = transformers.ConvBertForMaskedLM(config).eval()
        d = str(tmp_path / f"cb{num_groups}")
        tm.save_pretrained(d, safe_serialization=True)
        m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
        assert not m.load_report.missing_keys, m.load_report.missing_keys
        assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
        import torch as _t

        with _t.no_grad():
            ref = tm(input_ids=_t.tensor(IDS),
                     attention_mask=_t.tensor(MASK)).logits.numpy()
        out = m(m.params, input_ids=jnp.asarray(IDS),
                attention_mask=jnp.asarray(MASK))
        assert max_abs_diff(out.logits, ref) < 5e-5, num_groups
