"""Qwen3-VL / Qwen3-VL-MoE parity: interpolated vision position grid,
DeepStack feature injection, interleaved M-RoPE, stacked-tensor MoE."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TEXT = dict(vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            max_position_embeddings=128,
            rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 2],
                          "mrope_interleaved": True},
            tie_word_embeddings=False)
VISION = dict(depth=3, hidden_size=32, num_heads=4, patch_size=4, temporal_patch_size=2,
              spatial_merge_size=2, in_channels=3, intermediate_size=64,
              out_hidden_size=32, num_position_embeddings=16,
              deepstack_visual_indexes=[0, 1])
TOKENS = dict(image_token_id=97, video_token_id=96, vision_start_token_id=95,
              vision_end_token_id=94)


def _image_inputs():
    rng = np.random.default_rng(0)
    grid = np.array([[1, 4, 4]], np.int64)
    patches = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.array([[95, 97, 97, 97, 97, 5, 9, 3]], dtype=np.int64)
    return ids, patches, grid


@pytest.fixture(scope="module")
def dense_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("qwen3vl"))
    torch.manual_seed(0)
    config = transformers.Qwen3VLConfig(text_config=TEXT, vision_config=VISION,
                                        **TOKENS, attn_implementation="eager")
    tm = transformers.Qwen3VLForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


@pytest.fixture(scope="module")
def moe_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("qwen3vlmoe"))
    torch.manual_seed(0)
    text = dict(TEXT, num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
                decoder_sparse_step=1, mlp_only_layers=[])
    config = transformers.Qwen3VLMoeConfig(text_config=text, vision_config=VISION,
                                           **TOKENS, attn_implementation="eager")
    tm = transformers.Qwen3VLMoeForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_qwen3_vl_text_only_parity(dense_ckpt):
    import torch

    d, tm = dense_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_qwen3_vl_image_parity(dense_ckpt):
    """Image forward exercises pos-embed interpolation + DeepStack injection."""
    import torch

    d, tm = dense_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _image_inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(patches), image_grid_thw=grid)
    assert max_abs_diff(out.logits, ref) < 5e-4


def test_qwen3_vl_generate_greedy(dense_ckpt):
    import torch

    d, tm = dense_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids, patches, grid = _image_inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                          image_grid_thw=torch.tensor(grid), max_new_tokens=6,
                          do_sample=False)
    gen = model.generate(model.params, input_ids=jnp.asarray(ids),
                         pixel_values=jnp.asarray(patches), image_grid_thw=grid,
                         max_new_tokens=6, prompt_pad_multiple=8)
    ours = np.asarray(gen)[0][-ref.shape[1]:]
    assert ours.tolist() == ref[0].tolist()


def test_qwen3_vl_moe_parity(moe_ckpt):
    import torch

    d, tm = moe_ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids, patches, grid = _image_inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(patches), image_grid_thw=grid)
    assert max_abs_diff(out.logits, ref) < 5e-4
