"""CANINE parity vs torch: hash embeddings + local attn + down/upsampling."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)
B, S = 2, 16
IDS = RNG.integers(1, 1000, size=(B, S)).astype(np.int64)
MASK = np.ones((B, S), np.int64)
MASK[1, -4:] = 0


def _cfg(transformers, **kw):
    return transformers.CanineConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=64, num_hash_functions=4,
        num_hash_buckets=64, downsampling_rate=4, upsampling_kernel_size=4,
        local_transformer_stride=8, type_vocab_size=4, **kw)


def test_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.CanineModel(_cfg(transformers)).eval()
    d = str(tmp_path / "canine")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out.last_hidden_state)
                  - ref.last_hidden_state.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.pooler_output)
                  - ref.pooler_output.numpy()).max() < 5e-5


def test_heads_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.CanineForTokenClassification(
        _cfg(transformers, num_labels=3)).eval()
    d = str(tmp_path / "canine_tok")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForTokenClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    tm2 = transformers.CanineForQuestionAnswering(_cfg(transformers)).eval()
    d2 = str(tmp_path / "canine_qa")
    tm2.save_pretrained(d2, safe_serialization=True)
    m2 = ttpu.AutoModelForQuestionAnswering.from_pretrained(d2, dtype="float32")
    with torch.no_grad():
        ref2 = tm2(input_ids=torch.from_numpy(IDS),
                   attention_mask=torch.from_numpy(MASK))
    out2 = m2(m2.params, input_ids=jnp.asarray(IDS),
              attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out2.start_logits)
                  - ref2.start_logits.numpy()).max() < 5e-5
