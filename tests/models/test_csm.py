"""CSM (Sesame) parity vs torch: backbone over summed codebook-frame
embeddings, text+audio merge through the Mimi codec, and the depth decoder's
per-position codebooks head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

MIMI = dict(model_type="mimi", sampling_rate=2400, hidden_size=32,
            num_filters=8, num_residual_layers=1, upsampling_ratios=[4, 2],
            kernel_size=7, last_kernel_size=3, residual_kernel_size=3,
            codebook_size=32, codebook_dim=16, num_quantizers=4,
            num_semantic_quantizers=1,
            vector_quantization_hidden_dimension=16, upsample_groups=32,
            num_hidden_layers=2, intermediate_size=64, num_attention_heads=4,
            num_key_value_heads=4, sliding_window=16,
            attn_implementation="eager")


def _cfg():
    return transformers.CsmConfig(
        num_codebooks=4, vocab_size=32, text_vocab_size=60, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, pad_token_id=55, audio_token_id=55,
        audio_eos_token_id=56, bos_token_id=57,
        depth_decoder_config=dict(num_codebooks=4, vocab_size=32,
                                  backbone_hidden_size=32, hidden_size=16,
                                  intermediate_size=32, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  num_key_value_heads=1),
        codec_config=dict(MIMI))


def _make(tmp_path, name):
    torch.manual_seed(0)
    tm = transformers.CsmForConditionalGeneration(_cfg()).eval()
    with torch.no_grad():
        for q in [tm.codec_model.quantizer.semantic_residual_vector_quantizer,
                  tm.codec_model.quantizer.acoustic_residual_vector_quantizer]:
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.uniform_(0.5, 2.0)
    d = str(tmp_path / name)
    tm.save_pretrained(d, safe_serialization=True)
    return tm, d


def test_csm_backbone_parity(tmp_path):
    from transformers_tpu.models.csm import CsmForConditionalGeneration

    tm, d = _make(tmp_path, "csm")
    m = CsmForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    frames = rng.integers(1, 32, size=(1, 6, 4)).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(frames))
    out = m(m.params, input_ids=jnp.asarray(frames))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4


def test_csm_audio_merge_parity(tmp_path):
    from transformers_tpu.models.csm import CsmForConditionalGeneration

    tm, d = _make(tmp_path, "csm2")
    m = CsmForConditionalGeneration.from_pretrained(d, dtype="float32")

    rng = np.random.default_rng(1)
    wave = rng.standard_normal((1, 1, 64)).astype(np.float32)
    cutoffs = np.array([[64]], np.int64)
    # 64 samples -> 4 Mimi frames (conv hop 8 x frame-rate downsample 2)
    ids = np.array([[57] + [55] * 4 + [56, 3, 4]], np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 input_values=torch.from_numpy(wave),
                 input_values_cutoffs=torch.from_numpy(cutoffs))
    out = m(m.params, input_ids=jnp.asarray(ids),
            input_values=jnp.asarray(wave),
            input_values_cutoffs=jnp.asarray(cutoffs))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 3e-4


def test_csm_depth_decoder_parity(tmp_path):
    from transformers_tpu.models.csm import CsmForConditionalGeneration

    tm, d = _make(tmp_path, "csm3")
    m = CsmForConditionalGeneration.from_pretrained(d, dtype="float32")

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 32, size=(1, 4)).astype(np.int64)
    hb = rng.standard_normal((1, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm.depth_decoder(
            input_ids=torch.from_numpy(ids),
            backbone_last_hidden_state=torch.from_numpy(hb))
    dp = m.params["depth_decoder"]
    hidden, _ = m.depth_decoder.model(
        dp["model"], jnp.asarray(ids),
        backbone_last_hidden_state=jnp.asarray(hb))
    logits = m.depth_decoder.codebooks_head(
        dp["codebooks_head"], hidden[:, 1:], jnp.arange(1, ids.shape[1]))
    assert max_abs_diff(logits, ref.logits.numpy()) < 2e-4
