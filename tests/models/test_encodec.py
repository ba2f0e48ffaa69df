"""EnCodec codec parity: encode->RVQ codes and decode->waveform vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_codec_roundtrip_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.EncodecConfig(
        audio_channels=1, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[4, 2], codebook_size=64, codebook_dim=16, hidden_size=16,
        num_lstm_layers=2, kernel_size=3, last_kernel_size=3, residual_kernel_size=3,
        compress=2, target_bandwidths=[30.0, 60.0])
    tm = transformers.EncodecModel(cfg).eval()
    # randomize codebooks (init is zeros -> degenerate argmin ties)
    with torch.no_grad():
        for layer in tm.quantizer.layers:
            layer.codebook.embed.normal_()
    d = str(tmp_path / "encodec")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, 1, 160)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(audio))
    out = m(m.params, input_values=jnp.asarray(audio))
    np.testing.assert_array_equal(np.asarray(out.audio_codes), ref.audio_codes.numpy())
    assert max_abs_diff(out.audio_values, ref.audio_values.numpy()) < 1e-4
