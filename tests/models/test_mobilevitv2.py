"""MobileViTV2 (separable linear self-attention) parity vs torch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
hf = pytest.importorskip("transformers")

import jax.numpy as jnp

import transformers_tpu as ttpu


def test_mobilevitv2_classifier_parity(tmp_path):
    torch.manual_seed(0)
    cfg = hf.MobileViTV2Config(image_size=64, width_multiplier=0.5, num_labels=3)
    tm = hf.MobileViTV2ForImageClassification(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = ttpu.AutoModelForImageClassification.from_pretrained(tmp_path,
                                                                 dtype="float32")
    pix = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pix)).logits.numpy()
    got = np.asarray(model(model.params, pixel_values=jnp.asarray(pix)).logits)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
