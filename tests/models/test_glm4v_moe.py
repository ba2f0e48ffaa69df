"""GLM-4.5V parity: glm4v vision tower + MoE text stack with partial concat
M-RoPE (sections mixed on the doubled table, qwen2-vl convention)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(
    text_config=dict(vocab_size=99, hidden_size=64, intermediate_size=64,
                     num_hidden_layers=3, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16,
                     max_position_embeddings=128,
                     rope_scaling={"rope_type": "default", "mrope_section": [2, 1, 1]},
                     moe_intermediate_size=32, n_routed_experts=8,
                     n_shared_experts=1, num_experts_per_tok=2,
                     first_k_dense_replace=1, n_group=1, topk_group=1,
                     norm_topk_prob=True, routed_scaling_factor=1.0,
                     tie_word_embeddings=False),
    vision_config=dict(depth=2, hidden_size=32, num_heads=4, patch_size=4,
                       temporal_patch_size=2, spatial_merge_size=2, in_channels=3,
                       intermediate_size=64, out_hidden_size=64, image_size=16),
    image_token_id=97, video_token_id=96, image_start_token_id=95,
    image_end_token_id=94, video_start_token_id=93, video_end_token_id=92,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("glm4v_moe"))
    torch.manual_seed(0)
    config = transformers.Glm4vMoeConfig(**CFG, attn_implementation="eager")
    tm = transformers.Glm4vMoeForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_text_only_parity(ckpt):
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


def test_image_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(0)
    grid = np.array([[1, 4, 4]], np.int64)
    patches = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.array([[95, 97, 97, 97, 97, 94, 5, 9, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(patches), image_grid_thw=grid)
    assert max_abs_diff(out.logits, ref) < 5e-4


def test_generate_greedy(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(1)
    grid = np.array([[1, 4, 4]], np.int64)
    patches = rng.normal(size=(16, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.array([[95, 97, 97, 97, 97, 94, 5, 9]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids),
                          pixel_values=torch.tensor(patches),
                          image_grid_thw=torch.tensor(grid),
                          max_new_tokens=6, do_sample=False,
                          pad_token_id=0).numpy()
    out = model.generate(model.params, input_ids=jnp.asarray(ids),
                         pixel_values=jnp.asarray(patches), image_grid_thw=grid,
                         max_new_tokens=6, prompt_pad_multiple=8)
    np.testing.assert_array_equal(np.asarray(out)[0], ref[0])
