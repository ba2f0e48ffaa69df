"""VisionTextDualEncoder (CLIP-vision + BERT) parity vs torch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
hf = pytest.importorskip("transformers")

import jax.numpy as jnp

import transformers_tpu as ttpu


def test_vtde_parity(tmp_path):
    torch.manual_seed(0)
    vis = hf.CLIPVisionConfig(hidden_size=32, intermediate_size=37,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=30, patch_size=6)
    txt = hf.BertConfig(vocab_size=99, hidden_size=48, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64)
    cfg = hf.VisionTextDualEncoderConfig.from_vision_text_configs(
        vis, txt, projection_dim=24)
    cfg._attn_implementation = "eager"
    tm = hf.VisionTextDualEncoderModel(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(tmp_path, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids = np.array([[5, 9, 11, 3]], dtype=np.int64)
    pix = np.random.default_rng(0).standard_normal((1, 3, 30, 30)).astype(np.float32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pix),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix),
            attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out.logits_per_text),
                               ref.logits_per_text.numpy(), atol=5e-5, rtol=1e-4)
