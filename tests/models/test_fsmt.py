"""FSMT parity vs torch: dual-vocab fairseq transformer (logits + greedy)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def test_fsmt_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.fsmt import FSMTForConditionalGeneration

    torch.manual_seed(0)
    cfg = transformers.FSMTConfig(src_vocab_size=80, tgt_vocab_size=90, d_model=32,
                                  encoder_layers=2, decoder_layers=2,
                                  encoder_attention_heads=4, decoder_attention_heads=4,
                                  encoder_ffn_dim=48, decoder_ffn_dim=48,
                                  max_position_embeddings=64)
    tm = transformers.FSMTForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "fsmt")
    tm.save_pretrained(d, safe_serialization=True)
    m = FSMTForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[4, 17, 9, 42, 7, 2]], dtype=np.int64)
    dec = np.array([[2, 5, 8, 11]], dtype=np.int64)
    with torch.no_grad():
        # installed torch FSMT crashes building a DynamicCache (decoder has
        # no .config); the cache is irrelevant for a single forward
        ref = tm(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec),
                 use_cache=False).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5

    with torch.no_grad():
        tg = tm.generate(torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
                         num_beams=1, use_cache=False).numpy()
    og = np.asarray(m.generate(m.params, input_ids=jnp.asarray(ids), max_new_tokens=8))
    n = min(tg.shape[1], og.shape[1])
    np.testing.assert_array_equal(og[0, :n], tg[0, :n])
