"""Donut parity: DonutSwin encoder + MBart causal decoder through
VisionEncoderDecoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.fixture(scope="module")
def donut_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("donut"))
    torch.manual_seed(0)
    enc_cfg = transformers.DonutSwinConfig(
        image_size=32, patch_size=4, embed_dim=16, depths=[1, 1],
        num_heads=[2, 4], window_size=4)
    dec_cfg = transformers.MBartConfig(
        vocab_size=99, d_model=32, decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=64, max_position_embeddings=64, dropout=0.0,
        is_decoder=True, add_cross_attention=True, scale_embedding=True)
    cfg = transformers.VisionEncoderDecoderConfig.from_encoder_decoder_configs(
        enc_cfg, dec_cfg)
    cfg._attn_implementation = "eager"
    tm = transformers.VisionEncoderDecoderModel(cfg).eval()
    tm.config.decoder_start_token_id = 2
    tm.config.pad_token_id = 1
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


PIXELS = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
DEC = np.array([[2, 5, 9]], dtype=np.int64)


def test_forward_parity(donut_ckpt):
    import torch

    d, tm = donut_ckpt
    m = ttpu.AutoModelForVision2Seq.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(PIXELS),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PIXELS),
            decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_parity(donut_ckpt):
    import torch

    d, tm = donut_ckpt
    m = ttpu.AutoModelForVision2Seq.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(pixel_values=torch.tensor(PIXELS), max_new_tokens=6,
                          do_sample=False, decoder_start_token_id=2,
                          pad_token_id=1, eos_token_id=None).numpy()
    out = np.asarray(m.generate(m.params, pixel_values=jnp.asarray(PIXELS),
                                max_new_tokens=6, decoder_start_token_id=2,
                                eos_token_id=-1))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])
