"""Qwen2.5-VL parity vs torch: windowed vision attention (window permutation,
fullatt blocks), RMS vision blocks, SwiGLU vision MLP, M-RoPE text."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration  # noqa: E402

VISION = dict(depth=4, hidden_size=32, intermediate_size=48, num_heads=4,
              in_channels=3, patch_size=2, spatial_merge_size=2, temporal_patch_size=2,
              window_size=8, out_hidden_size=32, fullatt_block_indexes=[2])
TEXT = dict(vocab_size=160, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, rope_theta=10000.0,
            max_position_embeddings=128,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]})


def make_torch(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen2_5_VLConfig(
        text_config=TEXT, vision_config=VISION, image_token_id=150, video_token_id=151,
        vision_start_token_id=152, vision_end_token_id=153)
    tm = transformers.Qwen2_5_VLForConditionalGeneration(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def _inputs():
    # non-square 8x12 image -> grid (1, 4, 6): exercises window padding AND
    # distinct h/w mrope position rows (the section-mixing regression case)
    grid = np.array([[1, 4, 6]])
    pixels = np.random.default_rng(0).normal(size=(24, 3 * 2 * 2 * 2)).astype(np.float32)
    ids = np.array([[5, 152, *([150] * 6), 153, 9, 7]])
    return ids, pixels, grid


def test_multimodal_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "q25vl")
    tm = make_torch(d)
    m = Qwen2_5_VLForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    ids, pixels, grid = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pixels),
                 image_grid_thw=torch.from_numpy(grid)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            image_grid_thw=grid).logits
    assert np.abs(np.asarray(out) - ref).max() < 3e-5


def test_vision_tower_window_attention_parity(tmp_path):
    import torch

    d = str(tmp_path / "q25vl_v")
    tm = make_torch(d)
    m = Qwen2_5_VLForConditionalGeneration.from_pretrained(d, dtype="float32")
    _, pixels, grid = _inputs()
    with torch.no_grad():
        vout = tm.model.visual(torch.from_numpy(pixels), torch.from_numpy(grid))
        ref = vout.pooler_output if hasattr(vout, "pooler_output") else vout
    ours = m.model.visual(m.params["model"]["visual"], jnp.asarray(pixels), grid)
    assert np.abs(np.asarray(ours) - ref.numpy()).max() < 3e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "q25vl_g")
    tm = make_torch(d)
    m = Qwen2_5_VLForConditionalGeneration.from_pretrained(d, dtype="float32")
    ids, pixels, grid = _inputs()
    gen = m.generate(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
                     image_grid_thw=grid, max_new_tokens=5, do_sample=False,
                     prompt_pad_multiple=16, eos_token_id=-1)
    with torch.no_grad():
        tgen = tm.generate(input_ids=torch.from_numpy(ids),
                           pixel_values=torch.from_numpy(pixels),
                           image_grid_thw=torch.from_numpy(grid),
                           max_new_tokens=5, do_sample=False)
    np.testing.assert_array_equal(np.asarray(gen)[0, -5:], tgen.numpy()[0, -5:])


def test_video_t2_logit_parity(tmp_path):
    """t=2 video: per-FRAME vision attention segments (cu_seqlens regression)."""
    import torch

    d = str(tmp_path / "q25vl_vid")
    tm = make_torch(d)
    m = Qwen2_5_VLForConditionalGeneration.from_pretrained(d, dtype="float32")
    grid = np.array([[2, 4, 4]])
    pixels = np.random.default_rng(3).normal(size=(32, 3 * 2 * 2 * 2)).astype(np.float32)
    ids = np.array([[5, 152, *([151] * 8), 153, 9, 7]])
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values_videos=torch.from_numpy(pixels),
                 video_grid_thw=torch.from_numpy(grid)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values_videos=jnp.asarray(pixels), video_grid_thw=grid).logits
    assert np.abs(np.asarray(out) - ref).max() < 3e-5, np.abs(np.asarray(out) - ref).max()
