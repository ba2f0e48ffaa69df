"""Moonshine parity vs torch: conv stem + rotary pre-norm encoder-decoder ASR."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

AUDIO = np.random.default_rng(0).normal(size=(2, 2000)).astype(np.float32) * 0.1
DEC = np.array([[1, 5, 8, 9], [1, 3, 4, 6]], np.int64)


def test_conditional_generation_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.MoonshineConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=4, decoder_num_attention_heads=4,
        max_position_embeddings=64)
    tm = transformers.MoonshineForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "moonshine")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_values=torch.from_numpy(AUDIO),
                 decoder_input_ids=torch.from_numpy(DEC)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(AUDIO),
            decoder_input_ids=jnp.asarray(DEC))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-4

    rt = tm.generate(input_values=torch.from_numpy(AUDIO), max_new_tokens=6,
                     do_sample=False, num_beams=1)
    ours = m.generate(m.params, input_values=jnp.asarray(AUDIO), max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(ours)[:, : rt.shape[1]],
                                  rt.numpy()[:, : np.asarray(ours).shape[1]])
