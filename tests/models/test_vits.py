"""VITS parity vs torch (deterministic: noise scales 0) + text-to-audio pipeline."""

import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=40, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            ffn_dim=32, flow_size=8, spectrogram_bins=8, upsample_initial_channel=16,
            upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8], resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3]], prior_encoder_num_flows=2,
            prior_encoder_num_wavenet_layers=2, posterior_encoder_num_wavenet_layers=2,
            duration_predictor_num_flows=2, depth_separable_num_layers=2,
            duration_predictor_filter_channels=16, window_size=2,
            noise_scale=0.0, noise_scale_duration=0.0)

IDS = np.array([[1, 5, 9, 3, 7, 2]], dtype=np.int64)


@pytest.fixture(scope="module")
def vits_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("vits"))
    torch.manual_seed(0)
    cfg = transformers.VitsConfig(**TINY)
    tm = transformers.VitsModel(cfg).eval()
    tm.noise_scale = 0.0
    tm.noise_scale_duration = 0.0
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


@pytest.mark.parametrize("stochastic", [True, False])
def test_waveform_parity(stochastic, vits_ckpt, tmp_path):
    import torch
    import transformers

    if stochastic:
        d, tm = vits_ckpt
    else:
        d = str(tmp_path / "vits_det")
        torch.manual_seed(1)
        cfg = transformers.VitsConfig(**{**TINY, "use_stochastic_duration_prediction": False})
        tm = transformers.VitsModel(cfg).eval()
        tm.noise_scale = 0.0
        tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForTextToWaveform.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS))
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert out.waveform.shape == tuple(ref.waveform.shape)
    assert max_abs_diff(out.spectrogram, ref.spectrogram.numpy()) < 1e-4
    assert max_abs_diff(out.waveform, ref.waveform.numpy()) < 1e-4


def test_text_to_audio_pipeline(vits_ckpt):
    d, _ = vits_ckpt
    vocab = {"<pad>": 0, "<unk>": 1, "a": 2, "b": 3, "c": 4, "d": 5, " ": 6}
    with open(Path(d) / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(Path(d) / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "VitsTokenizer", "add_blank": True}, f)
    pipe = ttpu.pipeline("text-to-audio", model=d)
    out = pipe("abcd ab")
    assert out["sampling_rate"] == 16000
    assert out["audio"].ndim == 1 and out["audio"].size > 0


def test_vits_tokenizer_matches_torch(vits_ckpt):
    import transformers

    d, _ = vits_ckpt
    tok_t = transformers.VitsTokenizer.from_pretrained(d, phonemize=False)
    tok_j = ttpu.AutoTokenizer.from_pretrained(d)
    text = "Abc DA bc"
    ref = tok_t(text)["input_ids"]
    ours = tok_j(text)["input_ids"][0]
    assert list(ours) == list(ref)
