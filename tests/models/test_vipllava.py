"""VipLlava parity: multi-layer-concat projector with layernorm."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vision_config=dict(model_type="clip_vision_model", hidden_size=32, intermediate_size=64,
                       num_hidden_layers=4, num_attention_heads=4, image_size=16, patch_size=8),
    text_config=dict(model_type="llama", vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                     max_position_embeddings=128),
    image_token_index=98,
    image_seq_length=4,
    vision_feature_layers=[-2, 1],
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("vipllava"))
    torch.manual_seed(0)
    config = transformers.VipLlavaConfig(**TINY, attn_implementation="eager")
    tm = transformers.VipLlavaForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_forward_logit_parity(ckpt):
    import torch

    d, tm = ckpt
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ids = np.array([[98, 98, 98, 98, 5, 9, 3, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits, ref) < 5e-5
