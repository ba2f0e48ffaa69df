"""Mimi codec parity vs torch: SEANet convs + causal transformer + split
RVQ; encode (exact code indices) and decode (waveform) parity."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.mimi import MimiModel  # noqa: E402


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.MimiConfig(
        sampling_rate=2400, hidden_size=32, num_filters=8,
        num_residual_layers=1, upsampling_ratios=[4, 2], kernel_size=7,
        last_kernel_size=3, residual_kernel_size=3, codebook_size=32,
        codebook_dim=16, num_quantizers=4, num_semantic_quantizers=1,
        vector_quantization_hidden_dimension=16, upsample_groups=32,
        num_hidden_layers=2, intermediate_size=64, num_attention_heads=4,
        num_key_value_heads=4, sliding_window=16, attn_implementation="eager")
    tm = transformers.MimiModel(config).eval()
    # give the EMA codebooks distinct entries (fresh init is all-zero sums)
    with torch.no_grad():
        for q in [tm.quantizer.semantic_residual_vector_quantizer,
                  tm.quantizer.acoustic_residual_vector_quantizer]:
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.uniform_(0.5, 2.0)
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_encode_decode_parity(tmp_path):
    import torch

    d = str(tmp_path / "mimi")
    tm = make_tiny(d)
    model = MimiModel.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    wav = np.random.RandomState(0).randn(2, 1, 160).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_codes = tm.encode(torch.tensor(wav)).audio_codes
        ref_audio = tm.decode(ref_codes).audio_values.numpy()
    codes = model.encode(model.params, input_values=jnp.asarray(wav)).audio_codes
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
    audio = model.decode(model.params, audio_codes=codes).audio_values
    assert max_abs_diff(audio, ref_audio) < 5e-5

    with torch.no_grad():
        ref_full = tm(torch.tensor(wav)).audio_values.numpy()
    full = model(model.params, input_values=jnp.asarray(wav)).audio_values
    assert max_abs_diff(full, ref_full) < 5e-5
