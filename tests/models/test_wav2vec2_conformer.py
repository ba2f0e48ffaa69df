"""Wav2Vec2-Conformer parity vs torch (relative / rotary / no positions)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


@pytest.mark.parametrize("pos", ["relative", "rotary", None])
def test_wav2vec2_conformer_parity(tmp_path, pos):
    import torch
    import transformers

    from transformers_tpu.models.wav2vec2_conformer import Wav2Vec2ConformerForCTC

    torch.manual_seed(0)
    cfg = transformers.Wav2Vec2ConformerConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[3, 3],
        conv_stride=[2, 2], num_feat_extract_layers=2, num_conv_pos_embeddings=9,
        num_conv_pos_embedding_groups=2, conv_depthwise_kernel_size=5,
        position_embeddings_type=pos, do_stable_layer_norm=False,
        apply_spec_augment=False)
    tm = transformers.Wav2Vec2ConformerForCTC(cfg).eval()
    d = str(tmp_path / f"w2v2c_{pos}")
    tm.save_pretrained(d, safe_serialization=True)
    m = Wav2Vec2ConformerForCTC.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = np.random.default_rng(0).normal(size=(2, 400)).astype(np.float32)
    mask = np.ones((2, 400), np.int64)
    with torch.no_grad():
        ref = tm(input_values=torch.from_numpy(x),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(x), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 1e-4
