"""Parity tests for Aya Vision (pixel-shuffle SwiGLU projector), InternVL
(layer-scale ViT + pixel shuffle), LLaVA-OneVision (anyres-max + video)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


def test_aya_vision_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.AyaVisionConfig(
        vision_config=dict(model_type="siglip_vision_model", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        text_config=dict(model_type="cohere2", vocab_size=128, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, sliding_window=8,
                         sliding_window_pattern=2),
        image_token_index=99, downsample_factor=2,
    )
    tm = transformers.AyaVisionForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "aya")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # 32x32 -> 4x4 patches -> shuffle /4 -> 4 image tokens
    pix = RNG.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[5, 99, 99, 99, 99, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_internvl_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.InternVLConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=[32, 32], patch_size=[8, 8],
                           use_qk_norm=True),
        text_config=dict(model_type="qwen2", vocab_size=128, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128),
        image_token_id=99, downsample_ratio=0.5,
    )
    tm = transformers.InternVLForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "internvl")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # 4x4 patches -> drop CLS -> pixel shuffle 0.5 -> 4 image tokens
    pix = RNG.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[5, 99, 99, 99, 99, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix))
    assert max_abs_diff(out.logits, ref) < 5e-5


@pytest.fixture(scope="module")
def onevision_ckpt(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LlavaOnevisionConfig(
        vision_config=dict(model_type="siglip_vision_model", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=16, patch_size=8),
        text_config=dict(model_type="qwen2", vocab_size=128, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256),
        image_token_index=99, video_token_index=98,
        image_grid_pinpoints=[[16, 32], [32, 16], [32, 32]],
        vision_aspect_ratio="anyres_max_1",
    )
    tm = transformers.LlavaOnevisionForConditionalGeneration(cfg).eval()
    d = str(tmp_path_factory.mktemp("onevision") / "ckpt")
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_llava_onevision_image_parity(onevision_ckpt):
    import torch

    d, tm = onevision_ckpt
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # image 20x32 -> best fit (32, 32): 2x2 tile grid + base = 5 patches of
    # 16px; anyres_max_1 with unpad triggers the bilinear downscale path.
    image_sizes = np.array([[20, 32]], np.int64)
    pix = RNG.normal(size=(1, 5, 3, 16, 16)).astype(np.float32)
    n_img = 10  # = tm.get_image_features token count for this geometry
    with torch.no_grad():
        feats = tm.model.get_image_features(torch.from_numpy(pix),
                                            torch.from_numpy(image_sizes))
        n_img = sum(f.shape[0] for f in feats)
    ids = np.concatenate([[5], [99] * n_img, [7, 11]]).astype(np.int64)[None]
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pix),
                 image_sizes=torch.from_numpy(image_sizes)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix),
            image_sizes=image_sizes)
    assert max_abs_diff(out.logits, ref) < 5e-4


def test_llava_onevision_video_parity(onevision_ckpt):
    import torch

    d, tm = onevision_ckpt
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    pixv = RNG.normal(size=(1, 2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        vf = tm.model.get_video_features(torch.from_numpy(pixv), -1, "full")
    n_vid = vf.shape[0] * vf.shape[1] + 1  # + one newline per video
    ids = np.concatenate([[5], [98] * n_vid, [7, 11]]).astype(np.int64)[None]
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values_videos=torch.from_numpy(pixv)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values_videos=jnp.asarray(pixv))
    assert max_abs_diff(out.logits, ref) < 5e-4
