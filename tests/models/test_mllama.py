"""Mllama (Llama 3.2 Vision) parity vs torch: tiled ViT with gated tile/position
embeddings, global encoder, and tanh-gated cross-attention decoder layers."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def torch_mllama(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.MllamaConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_global_layers=1,
                           attention_heads=4, intermediate_size=64, vision_output_dim=64,
                           image_size=16, patch_size=8, max_num_tiles=2,
                           intermediate_layers_indices=[1],
                           supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]]),
        text_config=dict(vocab_size=128, hidden_size=32, num_hidden_layers=3,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=64, cross_attention_layers=[1],
                         max_position_embeddings=64,
                         rope_scaling={"rope_type": "default"},
                         bos_token_id=0, eos_token_id=1, pad_token_id=2),
        image_token_index=128,
    )
    tm = transformers.MllamaForConditionalGeneration(cfg).eval()
    d = str(tmp_path_factory.mktemp("mllama") / "ckpt")
    tm.save_pretrained(d, safe_serialization=True)
    return tm, d


def _inputs():
    pix = RNG.normal(size=(1, 1, 2, 3, 16, 16)).astype(np.float32)
    ar_ids = np.array([[2]], dtype=np.int64)          # 2x1 tile layout
    ar_mask = np.array([[[1, 1]]], dtype=np.int64)
    ids = np.array([[5, 128, 7, 11, 13]], dtype=np.int64)
    cam = np.zeros((1, 5, 1, 2), dtype=np.int64)
    cam[:, 1:, :, :] = 1                              # tokens after <image> attend
    return pix, ar_ids, ar_mask, ids, cam


def test_mllama_parity(torch_mllama):
    import torch

    tm, d = torch_mllama
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    pix, ar_ids, ar_mask, ids, cam = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pix),
                 aspect_ratio_ids=torch.from_numpy(ar_ids),
                 aspect_ratio_mask=torch.from_numpy(ar_mask),
                 cross_attention_mask=torch.from_numpy(cam)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix),
            aspect_ratio_ids=jnp.asarray(ar_ids), aspect_ratio_mask=jnp.asarray(ar_mask),
            cross_attention_mask=jnp.asarray(cam))
    diff = np.abs(np.asarray(out.logits) - ref).max()
    assert diff < 5e-5, f"logit diff {diff}"


def test_mllama_text_only_parity(torch_mllama):
    """Without pixel_values the cross layers are skipped entirely (ref :1136)."""
    import torch

    tm, d = torch_mllama
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    ids = np.array([[5, 9, 7, 11, 13, 2, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    diff = np.abs(np.asarray(out.logits) - ref).max()
    assert diff < 5e-5, f"logit diff {diff}"


def test_mllama_cached_decode_matches_full(torch_mllama):
    """Prefill+cached single-token steps == uncached full forward: exercises the
    MllamaCache cross K/V carry and the repeated last cross-mask row."""
    _, d = torch_mllama
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    pix, ar_ids, ar_mask, ids, cam = _inputs()
    extra = np.array([[17, 23]], dtype=np.int64)
    full_ids = np.concatenate([ids, extra], axis=1)
    full_cam = np.concatenate([cam, np.ones((1, 2, 1, 2), np.int64)], axis=1)

    ref = m(m.params, input_ids=jnp.asarray(full_ids), pixel_values=jnp.asarray(pix),
            aspect_ratio_ids=jnp.asarray(ar_ids), aspect_ratio_mask=jnp.asarray(ar_mask),
            cross_attention_mask=jnp.asarray(full_cam)).logits

    cache = m.init_cache(batch_size=1, max_len=16)
    attn = np.zeros((1, 16), np.int32)
    attn[:, :5] = 1
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix),
            aspect_ratio_ids=jnp.asarray(ar_ids), aspect_ratio_mask=jnp.asarray(ar_mask),
            cross_attention_mask=jnp.asarray(cam), past_key_values=cache,
            attention_mask=jnp.asarray(attn), cache_position=0)
    cache = out.past_key_values
    logits = [np.asarray(out.logits)[:, -1]]
    for step, tok in enumerate([17, 23]):
        attn[:, 5 + step] = 1
        out = m(m.params, input_ids=jnp.asarray([[tok]]), past_key_values=cache,
                attention_mask=jnp.asarray(attn), cache_position=5 + step)
        cache = out.past_key_values
        logits.append(np.asarray(out.logits)[:, -1])
    stepped = np.stack(logits, axis=1)
    diff = np.abs(stepped - np.asarray(ref)[:, 4:]).max()
    assert diff < 2e-4, f"cached decode diff {diff}"
