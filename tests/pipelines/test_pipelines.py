"""Pipeline task tests (reference tests/test_pipeline_mixin.py pattern)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))
from test_serve import make_tiny_tokenizer  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu import pipeline  # noqa: E402


@pytest.fixture(scope="module")
def text_ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe_text"))
    make_tiny_torch_llama(d, num_hidden_layers=2)
    make_tiny_tokenizer(d)
    return d


def test_text_generation_pipeline(text_ckpt):
    pipe = pipeline("text-generation", model=text_ckpt, dtype="float32")
    out = pipe("hello", max_new_tokens=5)
    assert isinstance(out[0]["generated_text"], str)
    assert out[0]["generated_text"].startswith("hello")


def test_text_generation_chat(text_ckpt):
    pipe = pipeline("text-generation", model=text_ckpt, dtype="float32")
    out = pipe([{"role": "user", "content": "hi"}], max_new_tokens=4)
    msgs = out[0]["generated_text"]
    assert msgs[-1]["role"] == "assistant"


def test_text_classification_pipeline(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  max_position_embeddings=64, num_labels=3,
                                  id2label={0: "neg", 1: "neu", 2: "pos"},
                                  label2id={"neg": 0, "neu": 1, "pos": 2})
    transformers.BertForSequenceClassification(cfg).save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    pipe = pipeline("text-classification", model=d, dtype="float32")
    out = pipe("good stuff")
    assert out["label"] in ("neg", "neu", "pos") and 0 <= out["score"] <= 1


def test_image_classification_pipeline(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                                 intermediate_size=64, image_size=32, patch_size=8, num_labels=3)
    transformers.ViTForImageClassification(cfg).save_pretrained(d, safe_serialization=True)
    __import__("transformers_tpu.models.vit", fromlist=["ViTImageProcessor"]).ViTImageProcessor(size={"height": 32, "width": 32}).save_pretrained(d)
    pipe = pipeline("image-classification", model=d, dtype="float32")
    image = np.random.default_rng(0).integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
    out = pipe(image)
    assert len(out) == 3 and abs(sum(o["score"] for o in out) - 1.0) < 1e-4


def test_zero_shot_image_classification(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=32),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        projection_dim=16)
    transformers.CLIPModel(cfg).save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    __import__("transformers_tpu.models.clip", fromlist=["CLIPImageProcessor"]).CLIPImageProcessor(size={"shortest_edge": 32},
                                        crop_size={"height": 32, "width": 32}).save_pretrained(d)
    pipe = pipeline("zero-shot-image-classification", model=d, dtype="float32")
    image = np.random.default_rng(0).integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
    out = pipe(image, candidate_labels=["cat", "dog"])
    assert {o["label"] for o in out} == {"cat", "dog"}


def test_asr_pipeline_long_form(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.WhisperConfig(
        vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, pad_token_id=0, bos_token_id=0, eos_token_id=98,
        suppress_tokens=None, begin_suppress_tokens=None)
    transformers.WhisperForConditionalGeneration(cfg).save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    from transformers_tpu.models.whisper import WhisperFeatureExtractor

    WhisperFeatureExtractor(feature_size=80).save_pretrained(d)
    pipe = pipeline("automatic-speech-recognition", model=d, dtype="float32")
    # 2.5 chunks of 30s audio -> sequential long-form path
    audio = np.random.default_rng(0).normal(size=16000 * 75).astype(np.float32) * 0.1
    out = pipe(audio, max_new_tokens=4)
    assert isinstance(out["text"], str)


def test_question_answering_pipeline(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  max_position_embeddings=64)
    transformers.BertForQuestionAnswering(cfg).save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    pipe = pipeline("question-answering", model=d, dtype="float32")
    out = pipe(question="who?", context="alice went home")
    assert set(out) >= {"answer", "score", "start", "end"}
    assert 0 <= out["score"] <= 1


def test_zero_shot_classification_pipeline(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  max_position_embeddings=64, num_labels=3,
                                  id2label={0: "contradiction", 1: "neutral", 2: "entailment"},
                                  label2id={"contradiction": 0, "neutral": 1, "entailment": 2})
    transformers.BertForSequenceClassification(cfg).save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    pipe = pipeline("zero-shot-classification", model=d, dtype="float32")
    out = pipe("the movie was great", candidate_labels=["positive", "negative"])
    assert set(out["labels"]) == {"positive", "negative"}
    assert abs(sum(out["scores"]) - 1.0) < 1e-5


def test_summarization_pipeline(tmp_path):
    import torch
    import transformers

    d = str(tmp_path)
    torch.manual_seed(0)
    cfg = transformers.T5Config(vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                                num_heads=4, relative_attention_num_buckets=8,
                                relative_attention_max_distance=16, decoder_start_token_id=0)
    transformers.T5ForConditionalGeneration(cfg).save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    pipe = pipeline("summarization", model=d, dtype="float32")
    out = pipe("summarize: a long story about nothing", max_new_tokens=6)
    assert isinstance(out[0]["summary_text"], str)


def test_asr_temperature_fallback(tmp_path):
    """ASR pipeline retries chunks at higher temperatures when quality checks
    fail; with passing checks the greedy output is kept."""
    import torch
    import transformers as hf

    torch.manual_seed(0)
    cfg = hf.WhisperConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=3,
        suppress_tokens=[], begin_suppress_tokens=[], forced_decoder_ids=None)
    d = str(tmp_path / "whisper_fb")
    hf.WhisperForConditionalGeneration(cfg).eval().save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d, vocab_size=64)
    from transformers_tpu.models.whisper import WhisperFeatureExtractor

    WhisperFeatureExtractor(feature_size=80).save_pretrained(d)
    pipe = ttpu.pipeline("automatic-speech-recognition", model=d)
    audio = np.random.default_rng(0).normal(size=16000).astype(np.float32)
    greedy = pipe(audio, max_new_tokens=8)
    # impossible thresholds force the full fallback ladder; still returns text
    fb = pipe(audio, max_new_tokens=8, temperature=(0.0, 0.4, 0.8),
              logprob_threshold=0.0)
    assert isinstance(greedy["text"], str) and isinstance(fb["text"], str)
    # permissive thresholds accept greedy: equals the plain greedy output
    ok = pipe(audio, max_new_tokens=8, temperature=(0.0, 0.4),
              logprob_threshold=-1e9, compression_ratio_threshold=1e9)
    assert ok["text"] == greedy["text"]


def test_audio_classification_pipeline(tmp_path):
    import torch
    import transformers as hf

    torch.manual_seed(0)
    cfg = hf.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 32), conv_stride=(4, 2), conv_kernel=(8, 4),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
        hidden_dropout=0.0, attention_dropout=0.0, num_labels=3,
        id2label={0: "cat", 1: "dog", 2: "bird"}, label2id={"cat": 0, "dog": 1, "bird": 2})
    d = str(tmp_path / "ac")
    hf.Wav2Vec2ForSequenceClassification(cfg).eval().save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.wav2vec2 import Wav2Vec2FeatureExtractor

    Wav2Vec2FeatureExtractor(do_normalize=True).save_pretrained(d)
    pipe = ttpu.pipeline("audio-classification", model=d)
    audio = np.random.default_rng(0).normal(size=800).astype(np.float32)
    out = pipe(audio, top_k=2)
    assert len(out) == 2 and out[0]["label"] in ("cat", "dog", "bird")
    assert out[0]["score"] >= out[1]["score"]


def test_image_feature_extraction_pipeline(tmp_path):
    import torch
    import transformers as hf

    torch.manual_seed(0)
    cfg = hf.ViTConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=16, patch_size=8, num_channels=3)
    d = str(tmp_path / "ife")
    hf.ViTModel(cfg).eval().save_pretrained(d, safe_serialization=True)
    json.dump({"image_processor_type": "ViTImageProcessor", "size": {"height": 16, "width": 16},
               "do_resize": True, "do_normalize": True, "do_rescale": True,
               "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5]},
              open(f"{d}/preprocessor_config.json", "w"))
    pipe = ttpu.pipeline("image-feature-extraction", model=d)
    img = np.random.default_rng(0).integers(0, 255, size=(3, 16, 16)).astype(np.uint8)
    feats = pipe(img)
    assert np.asarray(feats).shape[-1] == 32
