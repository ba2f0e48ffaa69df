"""CLAP parity vs torch + zero-shot-audio-classification pipeline."""

import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

# spec_size 32, mel 16 -> freq_ratio 2; patch stride 4 -> grid 8x8; window 2
TINY = dict(
    text_config=dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, pad_token_id=1),
    audio_config=dict(spec_size=32, num_mel_bins=16, window_size=2, patch_size=4,
                      patch_stride=[4, 4], patch_embeds_hidden_size=16,
                      depths=[2, 2], num_attention_heads=[2, 4], hidden_size=32,
                      mlp_ratio=2.0, enable_fusion=False),
    projection_dim=24,
)

IDS = np.array([[0, 5, 9, 3, 2], [0, 8, 15, 2, 1]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 1, 0]], dtype=np.int64)
# input_features [B, 1, T=spec*freq_ratio=64, mel=16]
FEATS = np.random.default_rng(0).normal(size=(2, 1, 64, 16)).astype(np.float32)


@pytest.fixture(scope="module")
def clap_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("clap"))
    torch.manual_seed(0)
    config = transformers.ClapConfig(**TINY)
    config._attn_implementation = "eager"
    tm = transformers.ClapModel(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_clap_parity(clap_ckpt):
    import torch

    d, tm = clap_ckpt
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 input_features=torch.tensor(FEATS))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            input_features=jnp.asarray(FEATS))
    assert max_abs_diff(out.text_embeds, ref.text_embeds.numpy()) < 3e-5
    assert max_abs_diff(out.audio_embeds, ref.audio_embeds.numpy()) < 3e-5
    assert max_abs_diff(out.logits_per_audio, ref.logits_per_audio.numpy()) < 1e-4


def test_feature_extractor_matches_torch():
    import transformers

    kw = dict(feature_size=16, sampling_rate=8000, hop_length=128, max_length_s=1,
              fft_window_size=256, frequency_min=0, frequency_max=4000)
    from transformers_tpu.models.clap import ClapFeatureExtractor

    fe_t = transformers.ClapFeatureExtractor(**kw, truncation="rand_trunc")
    fe_j = ClapFeatureExtractor(**kw, truncation="rand_trunc")
    audio = np.sin(np.linspace(0, 440 * np.pi, 4000)).astype(np.float64)
    ref = fe_t(audio, sampling_rate=8000, padding="repeatpad")["input_features"][0]
    ours = np.asarray(fe_j(audio, padding="repeatpad")["input_features"][0])
    assert ours.shape == tuple(np.asarray(ref).shape)
    # sub-millidecibel agreement (filter-bank rounding differs in fp32)
    assert np.max(np.abs(ours - np.asarray(ref))) < 2e-3


def test_zero_shot_audio_classification_pipeline(clap_ckpt, tmp_path):
    d, _ = clap_ckpt
    # tiny wordpiece tokenizer + feature extractor config
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "this", "is", "a", "sound", "of",
             "dog", "cat", "rain", "."]
    (Path(d) / "vocab.txt").write_text("\n".join(vocab))
    (Path(d) / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "BertTokenizer", "do_lower_case": true}')
    with open(Path(d) / "preprocessor_config.json", "w") as f:
        # 8000 samples, hop 126, n_fft 62 -> exactly 64 frames = spec_size *
        # freq_ratio for the tiny audio tower
        json.dump({"feature_extractor_type": "ClapFeatureExtractor", "feature_size": 16,
                   "sampling_rate": 8000, "hop_length": 126, "max_length_s": 1,
                   "fft_window_size": 62, "frequency_min": 0, "frequency_max": 4000,
                   "truncation": "rand_trunc"}, f)
    pipe = ttpu.pipeline("zero-shot-audio-classification", model=d)
    audio = np.random.default_rng(0).normal(size=4000).astype(np.float64)
    out = pipe(audio, candidate_labels=["dog", "cat"])
    assert len(out) == 2
    assert abs(sum(r["score"] for r in out) - 1.0) < 1e-5
