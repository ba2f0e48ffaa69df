"""Idefics v1 parity vs torch: CLIP tower (+ perceiver resampler) into gated
tanh cross-attention llama, decoupled embeddings/LM head, cached decode."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg(**over):
    kw = dict(
        vocab_size=120, additional_vocab_size=4, hidden_size=32,
        intermediate_size=64, num_hidden_layers=4, num_attention_heads=4,
        cross_layer_interval=2, qk_layer_norms=True, alpha_initializer="normal",
        alphas_initializer_range=0.5, alpha_type="vector",
        vision_config=dict(embed_dim=24, image_size=16, intermediate_size=48,
                           patch_size=8, num_hidden_layers=2,
                           num_attention_heads=4),
        perceiver_config=dict(use_resampler=True, resampler_n_latents=6,
                              resampler_depth=2, resampler_n_heads=2,
                              resampler_head_dim=8,
                              qk_layer_norms_perceiver=True),
        use_resampler=True)
    kw.update(over)
    return transformers.IdeficsConfig(**kw)


def _inputs():
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 119, size=(1, 9))
    ids[0, -2] = 121  # an additional-vocab token (<image> style)
    px = rng.random((1, 2, 3, 16, 16)).astype(np.float32)  # 2 images
    img_mask = np.zeros((1, 9, 2), np.int64)
    img_mask[0, :5, 0] = 1   # first tokens see image 0
    img_mask[0, 5:, 1] = 1   # rest see image 1
    return ids.astype(np.int64), px, img_mask


@pytest.mark.parametrize("resampler", [True, False])
def test_idefics_parity(tmp_path, resampler):
    from transformers_tpu.models.idefics import IdeficsForVisionText2Text

    over = {} if resampler else {"use_resampler": False,
                                 "perceiver_config": dict(use_resampler=False)}
    torch.manual_seed(0)
    tm = transformers.IdeficsForVisionText2Text(_cfg(**over)).eval()
    d = str(tmp_path / "idefics")
    tm.save_pretrained(d, safe_serialization=True)

    m = IdeficsForVisionText2Text.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids, px, img_mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px),
                 image_attention_mask=torch.from_numpy(img_mask))
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(px),
            image_attention_mask=jnp.asarray(img_mask))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4


def test_idefics_cached_decode_matches_full():
    from transformers_tpu.models.idefics import IdeficsForVisionText2Text
    from transformers_tpu.models.idefics.configuration_idefics import (
        IdeficsConfig,
    )
    import jax

    cfg = IdeficsConfig(
        vocab_size=120, additional_vocab_size=4, hidden_size=32,
        intermediate_size=64, num_hidden_layers=4, num_attention_heads=4,
        cross_layer_interval=2, use_resampler=False,
        vision_config=dict(embed_dim=24, image_size=16, intermediate_size=48,
                           patch_size=8, num_hidden_layers=2,
                           num_attention_heads=4))
    m = IdeficsForVisionText2Text(cfg, dtype=jnp.float32)
    params = m.init(jax.random.key(0))
    ids, px, img_mask = _inputs()
    full = m(params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(px),
             image_attention_mask=jnp.asarray(img_mask))

    cache = m.init_cache(1, ids.shape[1] + 2)
    pre = m(params, input_ids=jnp.asarray(ids[:, :-2]),
            pixel_values=jnp.asarray(px),
            image_attention_mask=jnp.asarray(img_mask[:, :-2]),
            past_key_values=cache, cache_position=0,
            attention_mask=jnp.concatenate(
                [jnp.ones((1, ids.shape[1] - 2), jnp.int32),
                 jnp.zeros((1, 4), jnp.int32)], 1))
    step = m(params, input_ids=jnp.asarray(ids[:, -2:-1]),
             past_key_values=pre.past_key_values,
             cache_position=ids.shape[1] - 2,
             attention_mask=jnp.concatenate(
                 [jnp.ones((1, ids.shape[1] - 1), jnp.int32),
                  jnp.zeros((1, 3), jnp.int32)], 1))
    np.testing.assert_allclose(
        np.asarray(step.logits[0, -1]),
        np.asarray(full.logits[0, -2]), atol=2e-4)
