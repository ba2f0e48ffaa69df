"""Qwen2.5-Omni Thinker parity vs torch: windowed audio encoder + Qwen2.5-VL
vision + time-aligned 3D M-RoPE text stack."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

AUDIO_TOK, IMG_TOK, VID_TOK = 90, 91, 92
VSTART, VEND, ASTART, AEND = 93, 94, 95, 96


def _cfg():
    return transformers.Qwen2_5OmniThinkerConfig(
        audio_config=dict(num_mel_bins=12, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          d_model=32, n_window=4, max_source_positions=64,
                          output_dim=32),
        vision_config=dict(depth=2, hidden_size=32, intermediate_size=64,
                           num_heads=4, patch_size=4, temporal_patch_size=2,
                           spatial_merge_size=2, window_size=8,
                           fullatt_block_indexes=[1], out_hidden_size=32,
                           embed_dim=32),
        text_config=dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128,
                         rope_scaling={"mrope_section": [2, 1, 1],
                                       "rope_type": "default",
                                       "type": "default"}),
        audio_token_index=AUDIO_TOK, image_token_index=IMG_TOK,
        video_token_index=VID_TOK, vision_start_token_id=VSTART,
        vision_end_token_id=VEND, audio_start_token_id=ASTART,
        audio_end_token_id=AEND)


def _audio(n_frames=32):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 12, n_frames)).astype(np.float32)
    fam = np.ones((1, n_frames), np.int64)
    return feats, fam


def test_omni_thinker_audio_text_parity(tmp_path):
    from transformers_tpu.models.qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )

    torch.manual_seed(0)
    tm = transformers.Qwen2_5OmniThinkerForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "omni")
    tm.save_pretrained(d, safe_serialization=True)

    m = Qwen2_5OmniThinkerForConditionalGeneration.from_pretrained(
        d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    feats, fam = _audio(32)
    # 32 mel frames -> 17 post-conv -> 8 audio tokens
    n_audio = 8
    ids = np.array([[5] + [ASTART] + [AUDIO_TOK] * n_audio + [AEND, 7, 8]],
                   np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 input_features=torch.from_numpy(feats),
                 feature_attention_mask=torch.from_numpy(fam)).logits
    out = m(m.params, input_ids=jnp.asarray(ids),
            input_features=jnp.asarray(feats),
            feature_attention_mask=jnp.asarray(fam))
    assert max_abs_diff(out.logits, ref.numpy()) < 3e-4


def test_omni_thinker_image_audio_parity(tmp_path):
    from transformers_tpu.models.qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )

    torch.manual_seed(1)
    tm = transformers.Qwen2_5OmniThinkerForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "omni2")
    tm.save_pretrained(d, safe_serialization=True)
    m = Qwen2_5OmniThinkerForConditionalGeneration.from_pretrained(
        d, dtype="float32")

    rng = np.random.default_rng(2)
    # one 8x8 image -> grid (1, 2, 2) after patch 4 -> 1 merged token... use
    # 16x16: grid (1, 4, 4) -> 4 merged tokens
    grid = np.array([[1, 4, 4]], np.int64)
    n_patches = 16
    px = rng.standard_normal((n_patches, 3 * 2 * 4 * 4)).astype(np.float32)
    feats, fam = _audio(32)
    ids = np.array([[5, VSTART, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, VEND,
                     ASTART] + [AUDIO_TOK] * 8 + [AEND, 7]], np.int64)
    am = np.ones_like(ids)
    # the torch oracle only computes M-RoPE positions when attention_mask is
    # provided; ours always does
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(am),
                 pixel_values=torch.from_numpy(px),
                 image_grid_thw=torch.from_numpy(grid),
                 input_features=torch.from_numpy(feats),
                 feature_attention_mask=torch.from_numpy(fam)).logits
    out = m(m.params, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(am),
            pixel_values=jnp.asarray(px), image_grid_thw=grid,
            input_features=jnp.asarray(feats),
            feature_attention_mask=jnp.asarray(fam))
    assert max_abs_diff(out.logits, ref.numpy()) < 5e-4
