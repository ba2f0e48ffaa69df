"""Xcodec parity vs torch: encode codes, decode waveform, full forward."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def tiny_torch_config():
    import transformers

    acoustic = transformers.DacConfig(
        decoder_hidden_size=8, encoder_hidden_size=8, codebook_size=16,
        downsampling_ratios=[16, 16])
    semantic = transformers.HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=12, conv_dim=(4, 4, 4, 4, 4, 4, 4))
    return transformers.XcodecConfig(
        sample_rate=16000, codebook_size=1024,
        acoustic_model_config=acoustic, semantic_model_config=semantic)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("xcodec"))
    torch.manual_seed(0)
    tm = transformers.XcodecModel(tiny_torch_config()).eval()
    # give the zero-initialized EMA codebooks distinct entries
    with torch.no_grad():
        for q in tm.quantizer.quantizers:
            q.codebook.embed.normal_(0.0, 1.0)
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.xcodec import XcodecModel

    m = XcodecModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 1, 256)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav))
    out = m(m.params, jnp.asarray(wav))
    assert out.audio_codes.shape == tuple(ref.audio_codes.shape)
    assert np.array_equal(np.asarray(out.audio_codes), ref.audio_codes.numpy())
    assert out.audio_values.shape == tuple(ref.audio_values.shape)
    assert max_abs_diff(out.audio_values, ref.audio_values.numpy()) < 1e-4


def test_encode_bandwidth(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.xcodec import XcodecModel

    m = XcodecModel.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 1, 256)).astype(np.float32) * 0.3
    bw = m.config.target_bandwidths[1]
    with torch.no_grad():
        ref_codes = tm.encode(torch.from_numpy(wav), bandwidth=bw, return_dict=False)
    codes = m.encode(m.params, jnp.asarray(wav), bandwidth=bw).audio_codes
    assert codes.shape == tuple(ref_codes.shape)
    assert np.array_equal(np.asarray(codes), ref_codes.numpy())


def test_decode_from_codes(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.xcodec import XcodecModel

    m = XcodecModel.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 1024, size=(1, m.config.num_quantizers, 3))
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(codes), return_dict=False)
    out = m.decode(m.params, jnp.asarray(codes)).audio_values
    assert out.shape == tuple(ref.shape)
    assert max_abs_diff(out, ref.numpy()) < 1e-4
