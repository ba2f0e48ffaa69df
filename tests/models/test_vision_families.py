"""Vision family parity suite (DeiT / DINOv2 / ConvNeXtV2 / ...) vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

# family -> (torch model class, torch config class, config dict, input image size)
CASES = {
    "deit": ("DeiTForImageClassificationWithTeacher", "DeiTConfig",
             dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
                  intermediate_size=64, image_size=32, patch_size=8, num_labels=5), 32),
    "dinov2": ("Dinov2ForImageClassification", "Dinov2Config",
               dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
                    mlp_ratio=2, image_size=32, patch_size=8, num_labels=5), 32),
    "dinov2-swiglu": ("Dinov2ForImageClassification", "Dinov2Config",
                      dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                           mlp_ratio=4, use_swiglu_ffn=True, image_size=32, patch_size=8,
                           num_labels=5), 32),
    "convnextv2": ("ConvNextV2ForImageClassification", "ConvNextV2Config",
                   dict(hidden_sizes=[8, 16, 24, 32], depths=[1, 1, 2, 1], num_labels=5,
                        image_size=32), 32),
    # 64px/4 = 16x16 grid; window 4 -> stages see 16/8/4/2 with shifted blocks
    # active in the first two stages and clamping in the last two.
    "swin": ("SwinForImageClassification", "SwinConfig",
             dict(image_size=64, patch_size=4, embed_dim=16, depths=[2, 2, 2],
                  num_heads=[2, 2, 4], window_size=4, num_labels=5), 64),
    "mobilenet_v2": ("MobileNetV2ForImageClassification", "MobileNetV2Config",
                     dict(image_size=32, depth_multiplier=0.25, num_labels=5), 32),
    "mobilenet_v2-notf": ("MobileNetV2ForImageClassification", "MobileNetV2Config",
                          dict(image_size=32, depth_multiplier=0.25, tf_padding=False,
                               num_labels=5), 32),
    "regnet": ("RegNetForImageClassification", "RegNetConfig",
               dict(hidden_sizes=[8, 16, 24, 32], depths=[1, 1, 2, 1],
                    embedding_size=8, groups_width=4, num_labels=5), 32),
    "regnet-x": ("RegNetForImageClassification", "RegNetConfig",
                 dict(hidden_sizes=[8, 16], depths=[1, 2], embedding_size=8,
                      groups_width=4, layer_type="x", num_labels=5), 32),
    "efficientnet": ("EfficientNetForImageClassification", "EfficientNetConfig",
                     dict(width_coefficient=0.5, depth_coefficient=0.5, image_size=32,
                          num_block_repeats=[1, 1, 1], in_channels=[32, 16, 24],
                          out_channels=[16, 24, 40], strides=[1, 2, 2],
                          kernel_sizes=[3, 5, 3], expand_ratios=[1, 6, 6],
                          hidden_dim=640, num_labels=5), 32),
    "beit": ("BeitForImageClassification", "BeitConfig",
             dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=64, image_size=16, patch_size=8,
                  use_relative_position_bias=True, layer_scale_init_value=0.1,
                  num_labels=5), 16),
    "beit-shared-bias": ("BeitForImageClassification", "BeitConfig",
                         dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=64, image_size=16, patch_size=8,
                              use_shared_relative_position_bias=True,
                              use_absolute_position_embeddings=True,
                              use_mean_pooling=False, layer_scale_init_value=0.0,
                              num_labels=5), 16),
    # NOTE: no use_absolute_embeddings oracle case — torch 4.57's Swin allocates
    # (num_patches + 1) absolute positions but adds them to num_patches tokens
    # (its own forward crashes); the v5 reference fixed the table to
    # num_patches, which is what we implement.
}


def save_torch(tmp_dir, cls_name, config_name, cfg, seed=0):
    import torch
    import transformers

    torch.manual_seed(seed)
    config = getattr(transformers, config_name)(**cfg, attn_implementation="eager")
    model = getattr(transformers, cls_name)(config).eval()
    model.save_pretrained(tmp_dir, safe_serialization=True)
    return model


@pytest.mark.parametrize("family", sorted(CASES))
def test_image_classification_parity(family, tmp_path):
    import torch

    cls_name, config_name, cfg, size = CASES[family]
    d = str(tmp_path / family)
    tm = save_torch(d, cls_name, config_name, cfg)
    model = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    pixels = np.random.default_rng(0).normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels)).logits.numpy()
    out = model(model.params, pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.logits, ref) < 5e-5, family


def test_deit_backbone_parity(tmp_path):
    import torch

    d = str(tmp_path / "deit_base")
    tm = save_torch(d, "DeiTModel", "DeiTConfig",
                    dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, image_size=32, patch_size=8))
    model = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    pixels = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
    out = model(model.params, pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.last_hidden_state, ref) < 3e-5


def test_dinov2_backbone_parity(tmp_path):
    import torch

    d = str(tmp_path / "dinov2_base")
    tm = save_torch(d, "Dinov2Model", "Dinov2Config",
                    dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                         mlp_ratio=2, image_size=32, patch_size=8))
    model = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    pixels = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
    out = model(model.params, pixel_values=jnp.asarray(pixels))
    assert max_abs_diff(out.last_hidden_state, ref) < 3e-5
