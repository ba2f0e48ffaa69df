"""Whisper parity tests: feature extraction, forward logits, greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.models.whisper import WhisperFeatureExtractor  # noqa: E402

WHISPER_TINY = dict(
    vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=16,
    max_source_positions=100, max_target_positions=40,
    decoder_start_token_id=1, pad_token_id=0, bos_token_id=0, eos_token_id=2,
    suppress_tokens=None, begin_suppress_tokens=None,
)


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("whisper"))
    torch.manual_seed(0)
    config = transformers.WhisperConfig(**WHISPER_TINY, attn_implementation="eager")
    tm = transformers.WhisperForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _features(b=1):
    rng = np.random.default_rng(0)
    # [B, n_mels, frames] — encoder conv stride 2 halves frames to match
    # max_source_positions
    return rng.normal(size=(b, 16, 200)).astype(np.float32) * 0.5


def test_feature_extractor_parity():
    from transformers import WhisperFeatureExtractor as TorchFE

    rng = np.random.default_rng(0)
    audio = (rng.normal(size=24000) * 0.1).astype(np.float32)
    theirs = TorchFE()([audio], sampling_rate=16000, return_tensors="np")["input_features"]
    ours = WhisperFeatureExtractor()([audio], sampling_rate=16000, return_tensors="np")["input_features"]
    assert np.abs(theirs - ours).max() < 1e-5


def test_forward_logit_parity(whisper_ckpt):
    import torch

    d, tm = whisper_ckpt
    model = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    feats = _features()
    dec_ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_features=torch.tensor(feats), decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = model(model.params, input_features=jnp.asarray(feats), decoder_input_ids=jnp.asarray(dec_ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_cached_decode_matches_full(whisper_ckpt):
    d, _ = whisper_ckpt
    model = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    feats = _features()
    dec_ids = np.array([[1, 5, 9, 3, 7, 2]], dtype=np.int32)
    full = model(model.params, input_features=jnp.asarray(feats), decoder_input_ids=jnp.asarray(dec_ids))
    enc = model.encode(model.params, jnp.asarray(feats))
    cache = model.init_decoder_cache(1, 6, dtype=jnp.float32)
    mask = np.zeros((1, 6), np.int32)
    for t in range(6):
        mask[:, t] = 1
        step = model(model.params, encoder_outputs=enc,
                     decoder_input_ids=jnp.asarray(dec_ids[:, t : t + 1]),
                     past_key_values=cache, cache_position=t,
                     decoder_attention_mask=jnp.asarray(mask))
        cache = step.past_key_values
        assert max_abs_diff(step.logits[:, 0], full.logits[:, t]) < 1e-4, f"step {t}"


def test_greedy_generate_matches_torch(whisper_ckpt):
    import torch

    d, tm = whisper_ckpt
    model = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    feats = _features(2)
    with torch.no_grad():
        ref = tm.generate(torch.tensor(feats), max_new_tokens=8, do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_features=jnp.asarray(feats),
                                    max_new_tokens=8, do_sample=False))
    # ours includes the decoder_start prompt; the reference strips it
    gen = out[:, 1:]
    n = min(gen.shape[1], ref.shape[1])
    np.testing.assert_array_equal(gen[:, :n], ref[:, :n])
