"""Parity vs torch: Dinov2-with-registers, MobileNetV1, VitPose(+backbone)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def test_dinov2_with_registers_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.dinov2_with_registers import (
        Dinov2WithRegistersForImageClassification,
    )

    torch.manual_seed(0)
    cfg = transformers.Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        image_size=32, patch_size=8, num_register_tokens=3, num_labels=5)
    tm = transformers.Dinov2WithRegistersForImageClassification(cfg).eval()
    with torch.no_grad():
        tm.dinov2_with_registers.embeddings.register_tokens.normal_()
    d = str(tmp_path / "d2r")
    tm.save_pretrained(d, safe_serialization=True)
    m = Dinov2WithRegistersForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_mobilenet_v1_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.mobilenet_v1 import MobileNetV1ForImageClassification

    torch.manual_seed(1)
    cfg = transformers.MobileNetV1Config(depth_multiplier=0.25, num_labels=5,
                                         image_size=64)
    tm = transformers.MobileNetV1ForImageClassification(cfg).eval()
    d = str(tmp_path / "mnv1")
    tm.save_pretrained(d, safe_serialization=True)
    m = MobileNetV1ForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5


@pytest.mark.parametrize("simple,experts", [(True, 1), (False, 1), (True, 2)])
def test_vitpose_parity(tmp_path, simple, experts):
    import torch
    import transformers

    from transformers_tpu.models.vitpose import VitPoseForPoseEstimation

    torch.manual_seed(2)
    bcfg = transformers.VitPoseBackboneConfig(
        image_size=[32, 16], patch_size=[8, 8], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_experts=experts,
        part_features=8, out_indices=[-1])
    cfg = transformers.VitPoseConfig(backbone_config=bcfg, num_labels=7,
                                     use_simple_decoder=simple)
    tm = transformers.VitPoseForPoseEstimation(cfg).eval()
    d = str(tmp_path / f"vitpose{simple}{experts}")
    tm.save_pretrained(d, safe_serialization=True)
    m = VitPoseForPoseEstimation.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(2).normal(size=(2, 3, 32, 16)).astype(np.float32)
    dsi = np.array([0, 1 % experts], dtype=np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px),
                 dataset_index=torch.from_numpy(dsi)).heatmaps.numpy()
    out = m(m.params, jnp.asarray(px), dataset_index=jnp.asarray(dsi))
    assert out.heatmaps.shape == ref.shape
    assert max_abs_diff(out.heatmaps, ref) < 5e-5


def test_swiftformer_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.swiftformer import SwiftFormerForImageClassification

    torch.manual_seed(3)
    cfg = transformers.SwiftFormerConfig(depths=[2, 2], embed_dims=[16, 24],
                                         downsamples=[True, True],
                                         image_size=32, num_labels=5)
    tm = transformers.SwiftFormerForImageClassification(cfg).eval()
    d = str(tmp_path / "swift")
    tm.save_pretrained(d, safe_serialization=True)
    m = SwiftFormerForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(3).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_textnet_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.textnet import TextNetForImageClassification

    torch.manual_seed(4)
    cfg = transformers.TextNetConfig(
        stem_out_channels=8, hidden_sizes=[8, 8, 16, 24, 32], num_labels=5,
        image_size=[32, 32])
    tm = transformers.TextNetForImageClassification(cfg).eval()
    d = str(tmp_path / "textnet")
    tm.save_pretrained(d, safe_serialization=True)
    m = TextNetForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(4).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_hgnet_v2_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.hgnet_v2 import HGNetV2ForImageClassification

    torch.manual_seed(5)
    cfg = transformers.HGNetV2Config(
        stem_channels=[3, 8, 8], stage_in_channels=[8, 16], stage_mid_channels=[8, 8],
        stage_out_channels=[16, 32], stage_num_blocks=[1, 2],
        stage_downsample=[False, True], stage_light_block=[False, True],
        stage_kernel_size=[3, 3], stage_numb_of_layers=[2, 2],
        hidden_sizes=[16, 32], use_learnable_affine_block=True, num_labels=5)
    tm = transformers.HGNetV2ForImageClassification(cfg).eval()
    d = str(tmp_path / "hgnet")
    tm.save_pretrained(d, safe_serialization=True)
    m = HGNetV2ForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(5).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5


@pytest.mark.parametrize("linear_attn", [False, True])
def test_pvt_v2_parity(tmp_path, linear_attn):
    import torch
    import transformers

    from transformers_tpu.models.pvt_v2 import PvtV2ForImageClassification

    torch.manual_seed(6)
    cfg = transformers.PvtV2Config(
        depths=[1, 1], sr_ratios=[2, 1], hidden_sizes=[16, 32],
        patch_sizes=[7, 3], strides=[4, 2], num_attention_heads=[1, 2],
        mlp_ratios=[2, 2], num_encoder_blocks=2, num_labels=5,
        linear_attention=linear_attn)
    tm = transformers.PvtV2ForImageClassification(cfg).eval()
    d = str(tmp_path / f"pvt2{linear_attn}")
    tm.save_pretrained(d, safe_serialization=True)
    m = PvtV2ForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    px = np.random.default_rng(6).normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5
