"""SpeechT5 parity vs torch: ASR (speech→text) forward + greedy generate,
TTS (text→speech) forward + deterministic generate (prenet dropout 0),
speech→speech forward, and the HiFi-GAN vocoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(vocab_size=81, hidden_size=24, encoder_layers=2,
           encoder_attention_heads=2, encoder_ffn_dim=48, decoder_layers=2,
           decoder_ffn_dim=48, decoder_attention_heads=2,
           conv_dim=(16, 16), conv_stride=(4, 2), conv_kernel=(8, 4),
           num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
           num_mel_bins=10, speech_decoder_prenet_layers=2,
           speech_decoder_prenet_units=16, speech_decoder_prenet_dropout=0.0,
           speaker_embedding_dim=8, speech_decoder_postnet_layers=2,
           speech_decoder_postnet_units=12, speech_decoder_postnet_kernel=3,
           reduction_factor=2, max_speech_positions=128, max_text_positions=64,
           encoder_max_relative_position=16, apply_spec_augment=False,
           mask_time_prob=0.0, mask_feature_prob=0.0)


def make_torch(cls_name, tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.SpeechT5Config(**CFG, attn_implementation="eager")
    tm = getattr(transformers, cls_name)(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_asr_forward_and_generate(tmp_path):
    import torch

    d = str(tmp_path / "asr")
    tm = make_torch("SpeechT5ForSpeechToText", d)
    model = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    rng = np.random.RandomState(0)
    wav = rng.randn(2, 320).astype(np.float32)
    mask = np.ones((2, 320), dtype=np.int64)
    mask[1, 200:] = 0
    dec = np.array([[2, 5, 9], [2, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(wav), attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = model(model.params, input_values=jnp.asarray(wav),
                attention_mask=jnp.asarray(mask), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5

    with torch.no_grad():
        gref = tm.generate(input_values=torch.tensor(wav),
                           attention_mask=torch.tensor(mask), max_new_tokens=5,
                           do_sample=False, num_beams=1).numpy()
    gout = np.asarray(model.generate(model.params, input_values=jnp.asarray(wav),
                                     attention_mask=jnp.asarray(mask),
                                     max_new_tokens=5))
    n = gref.shape[1]
    np.testing.assert_array_equal(gout[:, :n], gref)


def test_tts_forward_and_generate(tmp_path):
    import torch

    d = str(tmp_path / "tts")
    tm = make_torch("SpeechT5ForTextToSpeech", d)
    model = ttpu.AutoModelForTextToSpectrogram.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    ids = np.array([[4, 7, 9, 12, 3, 2]], dtype=np.int64)
    mel = np.random.RandomState(1).randn(1, 4, 10).astype(np.float32)
    spk = np.random.RandomState(2).randn(1, 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 decoder_input_values=torch.tensor(mel),
                 speaker_embeddings=torch.tensor(spk)).spectrogram.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                decoder_input_values=jnp.asarray(mel),
                speaker_embeddings=jnp.asarray(spk))
    assert max_abs_diff(out.spectrogram, ref) < 5e-5

    # deterministic generation (prenet dropout == 0) matches torch exactly
    with torch.no_grad():
        gref = tm.generate(input_ids=torch.tensor(ids),
                           speaker_embeddings=torch.tensor(spk),
                           maxlenratio=2.0).numpy()
    gout = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                     speaker_embeddings=jnp.asarray(spk),
                                     maxlenratio=2.0))
    assert gout.shape == gref.shape, (gout.shape, gref.shape)
    assert max_abs_diff(gout, gref) < 5e-4


def test_speech_to_speech_forward(tmp_path):
    import torch

    d = str(tmp_path / "s2s")
    tm = make_torch("SpeechT5ForSpeechToSpeech", d)
    from transformers_tpu.models.speecht5 import SpeechT5ForSpeechToSpeech

    model = SpeechT5ForSpeechToSpeech.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    rng = np.random.RandomState(3)
    wav = rng.randn(1, 320).astype(np.float32)
    mel = rng.randn(1, 4, 10).astype(np.float32)
    spk = rng.randn(1, 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(wav),
                 decoder_input_values=torch.tensor(mel),
                 speaker_embeddings=torch.tensor(spk)).spectrogram.numpy()
    out = model(model.params, input_values=jnp.asarray(wav),
                decoder_input_values=jnp.asarray(mel),
                speaker_embeddings=jnp.asarray(spk))
    assert max_abs_diff(out.spectrogram, ref) < 5e-5


def test_hifigan_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.SpeechT5HifiGanConfig(
        model_in_dim=10, upsample_initial_channel=16, upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    tm = transformers.SpeechT5HifiGan(config).eval()
    d = str(tmp_path / "hifigan")
    tm.save_pretrained(d, safe_serialization=True)

    from transformers_tpu.models.speecht5 import SpeechT5HifiGan

    model = SpeechT5HifiGan.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    mel = np.random.RandomState(4).randn(2, 12, 10).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(mel)).numpy()
    out = model(model.params, spectrogram=jnp.asarray(mel))
    assert out.shape == ref.shape
    assert max_abs_diff(out, ref) < 5e-5
