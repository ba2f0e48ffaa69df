"""ViT / CLIP parity + image-processing tests vs torch transformers."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.models.clip import CLIPImageProcessor  # noqa: E402
from transformers_tpu.models.vit import ViTImageProcessor  # noqa: E402

VIT_TINY = dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
                intermediate_size=64, image_size=32, patch_size=8, num_labels=5)


def save_torch(tmp_dir, cls_name, config_name, cfg, seed=0):
    import torch
    import transformers

    torch.manual_seed(seed)
    config = getattr(transformers, config_name)(**cfg, attn_implementation="eager")
    model = getattr(transformers, cls_name)(config).eval()
    model.save_pretrained(tmp_dir, safe_serialization=True)
    return model


def test_vit_image_classification_parity(tmp_path):
    import torch

    d = str(tmp_path / "vit")
    tm = save_torch(d, "ViTForImageClassification", "ViTConfig", VIT_TINY)
    model = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    pixels = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels)).logits.numpy()
    out = model(model.params, pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits, ref) < 3e-5


CLIP_TINY = dict(
    text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
                     eos_token_id=2),
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=32, patch_size=8),
    projection_dim=24,
)


def test_clip_parity(tmp_path):
    import torch

    d = str(tmp_path / "clip")
    tm = save_torch(d, "CLIPModel", "CLIPConfig", CLIP_TINY)
    model = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    ids = np.array([[5, 9, 3, 2], [7, 8, 2, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1], [1, 1, 1, 0]], dtype=np.int64)
    pixels = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pixels))
    out = model(model.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits_per_image, ref.logits_per_image.numpy()) < 1e-4
    assert max_abs_diff(out.text_embeds, ref.text_embeds.numpy()) < 3e-5
    assert max_abs_diff(out.image_embeds, ref.image_embeds.numpy()) < 3e-5


def test_vit_image_processor_vs_reference(tmp_path):
    """Device-side fused preprocess vs the reference processor (PIL path)."""
    from transformers import ViTImageProcessor as TorchViTImageProcessor

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)

    theirs = TorchViTImageProcessor()(images=[image], return_tensors="np")["pixel_values"]
    ours = ViTImageProcessor()(images=[image], return_tensors="np")["pixel_values"]
    assert ours.shape == theirs.shape == (1, 3, 224, 224)
    # Bilinear antialias filters differ slightly between PIL and XLA's
    # implementation; require close agreement, not bit equality.
    diff = np.abs(ours - theirs).mean()
    assert diff < 0.03, diff


def test_clip_image_processor_shapes():
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(100, 80, 3), dtype=np.uint8)
    out = CLIPImageProcessor()(images=[image], return_tensors="np")["pixel_values"]
    assert out.shape == (1, 3, 224, 224)


def test_image_processor_save_load_roundtrip(tmp_path):
    proc = ViTImageProcessor(size={"height": 128, "width": 128})
    proc.save_pretrained(str(tmp_path))
    loaded = ttpu.AutoImageProcessor.from_pretrained(str(tmp_path))
    assert loaded.size == {"height": 128, "width": 128}
    assert type(loaded).__name__ == "ViTImageProcessor"


def test_reference_processor_config_loads(tmp_path):
    """Hub compat: a torch-saved preprocessor_config.json loads with ours."""
    from transformers import CLIPImageProcessor as TorchCLIPImageProcessor

    TorchCLIPImageProcessor().save_pretrained(str(tmp_path))
    loaded = ttpu.AutoImageProcessor.from_pretrained(str(tmp_path))
    assert type(loaded).__name__ == "CLIPImageProcessor"
    assert loaded.do_center_crop


SIGLIP_TINY = dict(
    text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16),
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=32, patch_size=8),
)


def test_siglip_parity(tmp_path):
    import torch

    d = str(tmp_path / "siglip")
    tm = save_torch(d, "SiglipModel", "SiglipConfig", SIGLIP_TINY)
    model = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ids = np.array([[5, 9, 3, 2], [7, 8, 2, 1]], dtype=np.int64)
    pixels = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels))
    out = model(model.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.text_embeds, ref.text_embeds.numpy()) < 3e-5
    assert max_abs_diff(out.image_embeds, ref.image_embeds.numpy()) < 3e-5
    assert max_abs_diff(out.logits_per_image, ref.logits_per_image.numpy()) < 1e-4
