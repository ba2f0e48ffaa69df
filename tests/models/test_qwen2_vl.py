"""Qwen2-VL parity: M-RoPE text, vision tower, image forward, generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(
    text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
                     rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
                     tie_word_embeddings=False),
    vision_config=dict(depth=2, embed_dim=32, hidden_size=32, num_heads=4, patch_size=4,
                       temporal_patch_size=2, spatial_merge_size=2, in_channels=3),
    image_token_id=97, video_token_id=96, vision_start_token_id=95, vision_end_token_id=94,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("qwen2vl"))
    torch.manual_seed(0)
    config = transformers.Qwen2VLConfig(**CFG, attn_implementation="eager")
    tm = transformers.Qwen2VLForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _image_inputs():
    # one image: grid (t=1, h=4, w=4) => 16 patches before merge, 4 tokens after
    rng = np.random.default_rng(0)
    grid = np.array([[1, 4, 4]], np.int64)
    patches = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    # prompt: vision_start, 4 image tokens, then text
    ids = np.array([[95, 97, 97, 97, 97, 5, 9, 3]], dtype=np.int64)
    return ids, patches, grid


def test_text_only_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_image_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _image_inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(patches), image_grid_thw=grid)
    assert max_abs_diff(out.logits, ref) < 5e-4


def test_rope_index_matches_reference(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.qwen2_vl import get_rope_index

    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _image_inputs()
    ref_pos, ref_delta = tm.model.get_rope_index(torch.tensor(ids), torch.tensor(grid), None, None)
    pos, delta = get_rope_index(model.config, ids, grid, None, None)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy())


def test_generate_matches_torch(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _image_inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                          image_grid_thw=torch.tensor(grid), max_new_tokens=6,
                          do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    pixel_values=jnp.asarray(patches), image_grid_thw=grid,
                                    max_new_tokens=6, prompt_pad_multiple=1, eos_token_id=-1))
    np.testing.assert_array_equal(out[0], ref[0])


def test_image_processor_matches_reference():
    from transformers import Qwen2VLImageProcessor as TorchProc

    from transformers_tpu.models.qwen2_vl import Qwen2VLImageProcessor

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    theirs = TorchProc(patch_size=4, temporal_patch_size=2, merge_size=2,
                       min_pixels=16 * 16, max_pixels=40 * 40)(
        images=[image], return_tensors="np")
    ours = Qwen2VLImageProcessor(patch_size=4, temporal_patch_size=2, merge_size=2,
                                 min_pixels=16 * 16, max_pixels=40 * 40)(
        images=[image], return_tensors="np")
    np.testing.assert_array_equal(ours["image_grid_thw"], theirs["image_grid_thw"])
    assert ours["pixel_values"].shape == theirs["pixel_values"].shape
    diff = np.abs(ours["pixel_values"] - theirs["pixel_values"]).mean()
    assert diff < 0.1, diff  # resize-filter differences only


def test_multimodal_parity_nonsquare_grid(tmp_path):
    """Non-square image grid: distinct t/h/w position rows — regression test
    for the M-RoPE section-mixing order (reference splits by
    mrope_section * 2, alternating axes within each half)."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen2VLConfig(**CFG)
    tm = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "q2vl_ns")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

    model = Qwen2VLForConditionalGeneration.from_pretrained(d, dtype="float32")
    grid = np.array([[1, 4, 8]], np.int64)  # 32 patches -> 8 image tokens
    rng = np.random.default_rng(3)
    patches = rng.normal(size=(32, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.array([[5, 95, *([97] * 8), 94, 9]], np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(patches), image_grid_thw=grid)
    assert np.abs(np.asarray(out.logits) - ref).max() < 3e-5


def _video_inputs():
    # one video: grid (t=2, h=4, w=4) => 32 patches before merge, 8 tokens after
    rng = np.random.default_rng(7)
    grid = np.array([[2, 4, 4]], np.int64)
    patches = rng.normal(size=(32, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.array([[95, 96, 96, 96, 96, 96, 96, 96, 96, 5, 9, 3]], dtype=np.int64)
    return ids, patches, grid


def test_video_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _video_inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 pixel_values_videos=torch.tensor(patches),
                 video_grid_thw=torch.tensor(grid)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values_videos=jnp.asarray(patches), video_grid_thw=grid)
    assert max_abs_diff(out.logits, ref) < 5e-5, max_abs_diff(out.logits, ref)


def test_video_generate_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _video_inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids),
                          pixel_values_videos=torch.tensor(patches),
                          video_grid_thw=torch.tensor(grid), max_new_tokens=6,
                          do_sample=False)
    out = model.generate(model.params, input_ids=jnp.asarray(ids),
                         pixel_values_videos=jnp.asarray(patches),
                         video_grid_thw=grid, max_new_tokens=6,
                         prompt_pad_multiple=4, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(out)[0, -6:], ref.numpy()[0, -6:])
