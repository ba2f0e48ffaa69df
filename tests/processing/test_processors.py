"""Processor tests: llava image-token expansion, save/load, AutoProcessor."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))
from test_serve import make_tiny_tokenizer  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.fixture()
def tok_dir(tmp_path):
    make_tiny_tokenizer(str(tmp_path))
    return str(tmp_path)


def test_llava_processor_expands_image_tokens(tok_dir):
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.llava import LlavaProcessor

    tokenizer = ttpu.AutoTokenizer.from_pretrained(tok_dir)
    improc = CLIPImageProcessor(size={"shortest_edge": 16}, do_center_crop=True,
                                crop_size={"height": 16, "width": 16})
    proc = LlavaProcessor(image_processor=improc, tokenizer=tokenizer,
                          image_token="@", num_image_tokens=4)
    image = np.random.default_rng(0).integers(0, 255, size=(20, 20, 3), dtype=np.uint8)
    out = proc(text="@ hi", images=[image], return_tensors="np")
    assert out["pixel_values"].shape == (1, 3, 16, 16)
    at_id = tokenizer.encode("@")[0]
    ids = out["input_ids"][0].tolist()
    assert ids.count(at_id) == 4  # expanded to num_image_tokens


def test_whisper_processor(tok_dir):
    from transformers_tpu.models.whisper import WhisperFeatureExtractor, WhisperProcessor

    tokenizer = ttpu.AutoTokenizer.from_pretrained(tok_dir)
    proc = WhisperProcessor(feature_extractor=WhisperFeatureExtractor(feature_size=16),
                            tokenizer=tokenizer)
    audio = np.random.default_rng(0).normal(size=8000).astype(np.float32)
    out = proc(audio=[audio], return_tensors="np")
    assert out["input_features"].shape[1] == 16


def test_processor_save_load_roundtrip(tok_dir, tmp_path):
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.llava import LlavaProcessor

    tokenizer = ttpu.AutoTokenizer.from_pretrained(tok_dir)
    proc = LlavaProcessor(image_processor=CLIPImageProcessor(), tokenizer=tokenizer,
                          image_token="@", num_image_tokens=9)
    d = str(tmp_path / "saved")
    proc.save_pretrained(d)
    loaded = LlavaProcessor.from_pretrained(d)
    assert loaded.num_image_tokens == 9
    assert loaded.image_token == "@"
    assert loaded.tokenizer is not None and loaded.image_processor is not None
