"""ColPali / ColQwen2 late-interaction retrieval parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

PG = dict(
    vision_config=dict(model_type="siglip_vision_model", hidden_size=32,
                       intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=16, patch_size=8),
    text_config=dict(model_type="gemma", vocab_size=99, hidden_size=32,
                     intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                     max_position_embeddings=128, pad_token_id=0,
                     bos_token_id=1, eos_token_id=2),
    image_token_index=98, projection_dim=32)

Q2 = dict(
    text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128,
                     rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
                     tie_word_embeddings=False),
    vision_config=dict(depth=2, embed_dim=32, hidden_size=32, num_heads=4,
                       patch_size=4, temporal_patch_size=2,
                       spatial_merge_size=2, in_channels=3),
    image_token_id=97, video_token_id=96, vision_start_token_id=95,
    vision_end_token_id=94)


def test_colpali_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ColPaliConfig(
        vlm_config=transformers.PaliGemmaConfig(**PG, attn_implementation="eager"),
        embedding_dim=16)
    tm = transformers.ColPaliForRetrieval(cfg).eval()
    d = str(tmp_path / "colpali")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ids = np.array([[98, 98, 98, 98, 1, 5, 9, 3]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 attention_mask=torch.tensor(mask)).embeddings.numpy()
    got = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(pixels),
            attention_mask=jnp.asarray(mask)).embeddings
    assert max_abs_diff(got, ref) < 5e-5


def test_colqwen2_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ColQwen2Config(
        vlm_config=transformers.Qwen2VLConfig(**Q2, attn_implementation="eager"),
        embedding_dim=16)
    tm = transformers.ColQwen2ForRetrieval(cfg).eval()
    d = str(tmp_path / "colqwen2")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    grid = np.array([[1, 4, 4]], np.int64)
    patches = rng.normal(size=(1, 16, 3 * 2 * 4 * 4)).astype(np.float32)
    ids = np.array([[95, 97, 97, 97, 97, 5, 9, 3]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor(grid),
                 attention_mask=torch.tensor(mask)).embeddings.numpy()
    got = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(patches), image_grid_thw=grid,
            attention_mask=jnp.asarray(mask)).embeddings
    assert max_abs_diff(got, ref) < 5e-5
