"""Chameleon parity vs torch: VQ-VAE image tokenizer + BPE remap splice +
per-head q/k LayerNorm decoder (plain and swin_norm variants)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.chameleon import \
    ChameleonForConditionalGeneration  # noqa: E402

RNG = np.random.default_rng(0)

# 16 VQ codebook entries mapped to BPE ids 40..55 (IMGIMG names use A-J=0-9)
def _vocab_map():
    def name(i):
        return "IMGIMG" + "".join(chr(ord("A") + int(d)) for d in f"{i:02d}") + "Z"

    vmap = {name(i): 40 + i for i in range(16)}
    vmap["<image>"] = 39
    return vmap


def _cfg(transformers, swin_norm=False):
    return transformers.ChameleonConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        swin_norm=swin_norm, vocabulary_map=_vocab_map(),
        vq_config=dict(embed_dim=8, num_embeddings=16, latent_channels=8,
                       resolution=16, base_channels=32, channel_multiplier=[1, 2],
                       num_res_blocks=1, attn_resolutions=[8]),
    )


@pytest.mark.parametrize("swin_norm", [False, True])
def test_chameleon_parity(tmp_path, swin_norm):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = _cfg(transformers, swin_norm)
    tm = transformers.ChameleonForConditionalGeneration(cfg).eval()
    d = str(tmp_path / f"chameleon{swin_norm}")
    tm.save_pretrained(d, safe_serialization=True)
    m = ChameleonForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5

    if not swin_norm:
        # image splice: 16x16 image -> 2 downsamples? (mults [1,2] -> one
        # downsample) -> 8x8 latents -> 64 image tokens
        pix = RNG.normal(size=(1, 3, 16, 16)).astype(np.float32)
        n_tok = 64
        ids_img = np.concatenate([[1], [39] * n_tok, [5, 7]]).astype(np.int64)[None]
        with torch.no_grad():
            ref = tm(input_ids=torch.from_numpy(ids_img),
                     pixel_values=torch.from_numpy(pix)).logits.numpy()
        out = m(m.params, input_ids=jnp.asarray(ids_img), pixel_values=jnp.asarray(pix))
        assert max_abs_diff(out.logits, ref) < 5e-4
