"""MetaCLIP 2 parity vs torch transformers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
hf = pytest.importorskip("transformers")

import jax.numpy as jnp

import transformers_tpu as ttpu


def _cfg():
    # eos_token_id=2 on purpose: MetaCLIP2 must still pool at the FIRST eos,
    # unlike CLIP's legacy argmax(input_ids) path.
    text = dict(vocab_size=99, hidden_size=32, intermediate_size=37,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=64, eos_token_id=2, bos_token_id=0,
                pad_token_id=1)
    vision = dict(hidden_size=32, intermediate_size=37, num_hidden_layers=2,
                  num_attention_heads=4, image_size=30, patch_size=6,
                  num_channels=3)
    return hf.MetaClip2Config(text_config=text, vision_config=vision,
                              projection_dim=24)


def test_metaclip2_parity(tmp_path):
    torch.manual_seed(0)
    tm = hf.MetaClip2Model(_cfg()).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = ttpu.AutoModel.from_pretrained(tmp_path, dtype="float32")
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 99, (2, 7))
    ids[:, 4] = 2  # eos mid-sequence; later ids are larger -> exposes pooling
    pix = rng.standard_normal((2, 3, 30, 30)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pix))
    got = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(pix))
    np.testing.assert_allclose(np.asarray(got.logits_per_image),
                               ref.logits_per_image.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.text_embeds),
                               ref.text_embeds.numpy(), atol=3e-5, rtol=1e-4)
