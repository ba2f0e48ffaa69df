"""Round-5 processor sweep batch 3: the audio tier.

Feature extractors are parity-tested against the installed reference
(which runs its own numpy/torch DSP); processors check routing and the
Qwen2-Audio expansion formula."""

import sys
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))
from test_serve import make_tiny_tokenizer  # noqa: E402


@pytest.fixture()
def tok(tmp_path):
    import transformers_tpu as ttpu

    make_tiny_tokenizer(str(tmp_path))
    return ttpu.AutoTokenizer.from_pretrained(str(tmp_path))


def _wav(n=16000, seed=0, scale=0.1):
    return (np.random.default_rng(seed).standard_normal(n) * scale).astype(np.float32)


def test_speech_to_text_fbank_parity():
    from transformers_tpu.models.speech_to_text import Speech2TextFeatureExtractor

    ours = Speech2TextFeatureExtractor()
    ref = transformers.Speech2TextFeatureExtractor()
    wavs = [_wav(12000), _wav(16000, seed=1)]
    o = ours(wavs, return_tensors="np")
    r = ref(wavs, return_tensors="np", padding=True)
    assert o["input_features"].shape == tuple(r["input_features"].shape)
    np.testing.assert_array_equal(o["attention_mask"], np.asarray(r["attention_mask"]))
    assert np.abs(o["input_features"] - np.asarray(r["input_features"])).max() < 2e-3


def test_seamless_m4t_fbank_parity():
    from transformers_tpu.models.seamless_m4t import SeamlessM4TFeatureExtractor

    ours = SeamlessM4TFeatureExtractor()
    ref = transformers.SeamlessM4TFeatureExtractor()
    wavs = [_wav(8000, seed=2)]
    o = ours(wavs, return_tensors="np")
    r = ref(wavs, return_tensors="np", sampling_rate=16000)
    assert o["input_features"].shape == tuple(r["input_features"].shape)
    assert np.abs(o["input_features"] - np.asarray(r["input_features"])).max() < 2e-3


def test_speecht5_target_mel_parity():
    from transformers_tpu.models.speecht5 import SpeechT5FeatureExtractor

    ours = SpeechT5FeatureExtractor()
    ref = transformers.SpeechT5FeatureExtractor()
    wav = _wav(20000, seed=3)
    o = ours(audio_target=[wav], return_tensors="np")
    r = ref(audio_target=[wav], return_tensors="np")
    assert o["input_values"].shape == tuple(r["input_values"].shape)
    assert np.abs(o["input_values"] - np.asarray(r["input_values"])).max() < 2e-4
    # raw input path
    o2 = ours(audio=[wav], return_tensors="np")
    assert o2["input_values"].shape == (1, 20000)


def test_encodec_parity():
    from transformers_tpu.models.encodec import EncodecFeatureExtractor

    ours = EncodecFeatureExtractor()
    ref = transformers.EncodecFeatureExtractor()
    wavs = [_wav(9000, seed=4), _wav(12000, seed=5)]
    o = ours(wavs, return_tensors="np")
    r = ref(raw_audio=wavs, return_tensors="np", padding=True,
            sampling_rate=24000)
    assert o["input_values"].shape == tuple(r["input_values"].shape)
    np.testing.assert_allclose(o["input_values"], np.asarray(r["input_values"]),
                               atol=1e-6)
    np.testing.assert_array_equal(o["padding_mask"], np.asarray(r["padding_mask"]))


def test_parakeet_fbank_parity():
    from transformers_tpu.models.parakeet import ParakeetFeatureExtractor

    ours = ParakeetFeatureExtractor()
    try:
        ref = transformers.ParakeetFeatureExtractor()
        wavs = [_wav(12345, seed=6), _wav(16000, seed=7)]
        r = ref(wavs, return_tensors="np")
    except Exception as e:  # noqa: BLE001 — reference needs torch/librosa extras
        pytest.skip(f"reference ParakeetFeatureExtractor unavailable: {e}")
    o = ours(wavs, return_tensors="np")
    assert o["input_features"].shape == tuple(r["input_features"].shape)
    np.testing.assert_array_equal(o["attention_mask"],
                                  np.asarray(r["attention_mask"]).astype(np.int64))
    assert np.abs(o["input_features"] - np.asarray(r["input_features"])).max() < 2e-3


def test_musicgen_melody_chroma_parity():
    from transformers_tpu.models.musicgen_melody import (
        MusicgenMelodyFeatureExtractor,
    )

    ours = MusicgenMelodyFeatureExtractor()
    try:
        ref = transformers.MusicgenMelodyFeatureExtractor()
        wav = _wav(48000, seed=8, scale=0.5)
        r = ref([wav], return_tensors="np", sampling_rate=32000)
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference MusicgenMelodyFeatureExtractor unavailable: {e}")
    o = ours([wav], return_tensors="np")
    assert o["input_features"].shape == tuple(r["input_features"].shape)
    # one-hot chroma: compare argmax agreement (tiny fp differences can flip
    # near-ties on a handful of frames)
    agree = (o["input_features"].argmax(-1) ==
             np.asarray(r["input_features"]).argmax(-1)).mean()
    assert agree > 0.95, agree


def test_qwen2_audio_expansion(tok):
    from transformers_tpu.models.qwen2_audio import Qwen2AudioProcessor
    from transformers_tpu.models.whisper.feature_extraction_whisper import (
        WhisperFeatureExtractor,
    )

    proc = Qwen2AudioProcessor(feature_extractor=WhisperFeatureExtractor(),
                               tokenizer=tok, audio_token="@",
                               audio_bos_token="#", audio_eos_token="!")
    out = proc(text=["listen @ now"], audio=[_wav(16000, seed=9)],
               return_tensors="np")
    mel_len = int(np.asarray(out["feature_attention_mask"]).sum())
    input_length = (mel_len - 1) // 2 + 1
    want = (input_length - 2) // 2 + 1
    aid = tok.encode("@")[0]
    assert out["input_ids"][0].tolist().count(aid) == want
    assert out["input_ids"][0].tolist().count(tok.encode("#")[0]) == 1


def test_speecht5_processor_routes(tok):
    from transformers_tpu.models.speecht5 import (
        SpeechT5FeatureExtractor,
        SpeechT5Processor,
    )

    proc = SpeechT5Processor(feature_extractor=SpeechT5FeatureExtractor(),
                             tokenizer=tok)
    asr = proc(audio=[_wav()], text_target=["hello"], return_tensors="np")
    assert "input_values" in asr and "labels" in asr
    tts = proc(text=["hello"], audio_target=[_wav()], return_tensors="np")
    assert "input_ids" in tts and "labels" in tts
    assert tts["labels"].shape[-1] == 80


def test_wav2vec2_and_s2t_processors(tok):
    from transformers_tpu.models.speech_to_text import (
        Speech2TextFeatureExtractor,
        Speech2TextProcessor,
    )
    from transformers_tpu.models.wav2vec2 import (
        Wav2Vec2FeatureExtractor,
        Wav2Vec2Processor,
    )

    p1 = Wav2Vec2Processor(feature_extractor=Wav2Vec2FeatureExtractor(),
                           tokenizer=tok)
    out = p1(audio=[_wav()], text=["hi"], return_tensors="np")
    assert "input_values" in out and "labels" in out
    p2 = Speech2TextProcessor(feature_extractor=Speech2TextFeatureExtractor(),
                              tokenizer=tok)
    out = p2(audio=[_wav()], text=["hi"], return_tensors="np")
    assert "input_features" in out and "labels" in out


def test_voxtral_chunking(tok):
    from transformers_tpu.models.voxtral import VoxtralProcessor
    from transformers_tpu.models.whisper.feature_extraction_whisper import (
        WhisperFeatureExtractor,
    )

    proc = VoxtralProcessor(feature_extractor=WhisperFeatureExtractor(),
                            tokenizer=tok, max_source_positions=1000)
    out = proc(audio=[_wav(16000 * 31, seed=10)], text=["transcribe"],
               return_tensors="np")
    # whisper pads to 30s -> 3000 frames -> 3 chunks of 1000
    assert out["input_features"].shape[0] == 3
    assert out["input_features"].shape[-1] == 1000


def test_seamless_processor_exclusive(tok):
    from transformers_tpu.models.seamless_m4t import (
        SeamlessM4TFeatureExtractor,
        SeamlessM4TProcessor,
    )

    proc = SeamlessM4TProcessor(feature_extractor=SeamlessM4TFeatureExtractor(),
                                tokenizer=tok)
    with pytest.raises(ValueError):
        proc(text=["x"], audio=[_wav()])
    out = proc(audio=[_wav()], return_tensors="np")
    assert "input_features" in out
