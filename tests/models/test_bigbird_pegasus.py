"""BigBirdPegasus parity vs torch (original_full attention config):
pre-norm encoder with BigBird-layout attention + MBart-style decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[2, 5, 9, 3, 22, 7, 1], [2, 8, 15, 1, 0, 0, 0]], dtype=np.int64)
MASK = np.array([[1] * 7, [1, 1, 1, 1, 0, 0, 0]], dtype=np.int64)
DEC = np.array([[2, 11, 13], [2, 7, 9]], dtype=np.int64)


def make_tiny(tmp_dir, use_bias):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.BigBirdPegasusConfig(
        vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        attention_type="original_full", use_bias=use_bias,
        attn_implementation="eager")
    tm = transformers.BigBirdPegasusForConditionalGeneration(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_forward_logit_parity(tmp_path):
    import torch

    for use_bias in (False, True):
        d = str(tmp_path / f"bbp{use_bias}")
        tm = make_tiny(d, use_bias)
        model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
        assert not model.load_report.missing_keys, model.load_report.missing_keys
        assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
        with torch.no_grad():
            ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                     decoder_input_ids=torch.tensor(DEC)).logits.numpy()
        out = model(model.params, input_ids=jnp.asarray(IDS),
                    attention_mask=jnp.asarray(MASK),
                    decoder_input_ids=jnp.asarray(DEC))
        assert max_abs_diff(out.logits, ref) < 5e-5, use_bias


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "bbp-gen")
    tm = make_tiny(d, False)
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                          max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK),
                                    max_new_tokens=6))
    np.testing.assert_array_equal(out[:, :ref.shape[1]], ref)
