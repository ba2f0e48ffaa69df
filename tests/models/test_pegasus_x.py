"""Pegasus-X parity vs torch: global+blocked-local encoder attention."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[5, 14, 25, 36, 7, 8, 9, 10, 11, 1],
                [9, 11, 12, 13, 14, 15, 1, 0, 0, 0]], np.int64)
MASK = (IDS != 0).astype(np.int64)
DEC = np.array([[0, 5, 8, 9], [0, 3, 4, 6]], np.int64)


def _cfg(transformers, **kw):
    kw.setdefault("stagger_local_blocks", True)
    return transformers.PegasusXConfig(
        vocab_size=64, d_model=32, encoder_layers=3, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=48, decoder_ffn_dim=48, max_position_embeddings=64,
        num_global_tokens=3, block_size=4, **kw)


def test_conditional_generation_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.PegasusXForConditionalGeneration(_cfg(transformers)).eval()
    d = str(tmp_path / "pegx")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 decoder_input_ids=torch.from_numpy(DEC)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            decoder_input_ids=jnp.asarray(DEC))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    rt = tm.generate(torch.from_numpy(IDS), attention_mask=torch.from_numpy(MASK),
                     max_new_tokens=6, do_sample=False, num_beams=1)
    ours = m.generate(m.params, input_ids=jnp.asarray(IDS),
                      attention_mask=jnp.asarray(MASK), max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(ours)[:, : rt.shape[1]],
                                  rt.numpy()[:, : np.asarray(ours).shape[1]])


def test_unpadded_no_stagger(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.PegasusXForConditionalGeneration(
        _cfg(transformers, stagger_local_blocks=False)).eval()
    d = str(tmp_path / "pegx2")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    ids = IDS[:, :8]  # exact block multiple
    mask = MASK[:, :8]
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask),
                 decoder_input_ids=torch.from_numpy(DEC)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            decoder_input_ids=jnp.asarray(DEC))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5
