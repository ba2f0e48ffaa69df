"""Llama4 multimodal parity: 2D complex vision rotary, pixel-shuffle adapter,
image-token scatter into the MoE text decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.llama4 import \
    Llama4ForConditionalGeneration  # noqa: E402

RNG = np.random.default_rng(0)


def test_llama4_vision_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Llama4Config(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=128, image_size=16, patch_size=8,
                           pixel_shuffle_ratio=0.5, projector_input_dim=128,
                           projector_output_dim=128, vision_output_dim=128,
                           rope_theta=10000),
        text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                         intermediate_size_mlp=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         num_local_experts=2, num_experts_per_tok=1,
                         max_position_embeddings=128, attention_chunk_size=16,
                         interleave_moe_layer_step=1,
                         no_rope_layers=[1, 0]),
        image_token_index=97, boi_token_index=96, eoi_token_index=95,
    )
    tm = transformers.Llama4ForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "llama4")
    tm.save_pretrained(d, safe_serialization=True)
    m = Llama4ForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5

    # 16x16 image -> 2x2 patches + shuffle 0.5 -> 1 image token
    pix = RNG.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ids_img = np.array([[1, 96, 97, 95, 5, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids_img),
                 pixel_values=torch.from_numpy(pix)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids_img), pixel_values=jnp.asarray(pix))
    assert max_abs_diff(out.logits, ref) < 5e-4
