"""DAC codec parity vs torch: encode codes, decode waveform, full forward."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(encoder_hidden_size=8, downsampling_ratios=[2, 4], n_codebooks=3,
           codebook_size=32, codebook_dim=4, decoder_hidden_size=32,
           sampling_rate=16000)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("dac"))
    torch.manual_seed(0)
    tm = transformers.DacModel(transformers.DacConfig(**CFG)).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.dac import DacConfig, DacModel

    m = DacModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 1, 160)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav))
    out = m(m.params, jnp.asarray(wav))
    assert np.array_equal(np.asarray(out.audio_codes), ref.audio_codes.numpy())
    assert max_abs_diff(out.audio_values, ref.audio_values.numpy()) < 1e-4
    assert max_abs_diff(out.quantized_representation,
                        ref.quantized_representation.numpy()) < 1e-5


def test_decode_from_codes(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.dac import DacModel

    m = DacModel.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, size=(1, 3, 20))
    with torch.no_grad():
        ref = tm.decode(audio_codes=torch.from_numpy(codes)).audio_values
    out = m.decode(m.params, audio_codes=jnp.asarray(codes)).audio_values
    assert max_abs_diff(out, ref.numpy()) < 1e-4
