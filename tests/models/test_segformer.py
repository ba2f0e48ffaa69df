"""SegFormer parity vs torch: efficient attention with K/V sequence
reduction, Mix-FFN depthwise conv, all-MLP decode head, segmentation loss."""

import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)


def make_segformer(tmp_dir, **over):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=2, depths=[1, 1], sr_ratios=[2, 1],
        hidden_sizes=[8, 16], patch_sizes=[7, 3], strides=[4, 2],
        num_attention_heads=[1, 2], mlp_ratios=[2, 2], decoder_hidden_size=16,
        num_labels=3, drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0, **over)
    tm = transformers.SegformerForSemanticSegmentation(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_semantic_segmentation_parity(tmp_path):
    import torch

    d = str(tmp_path / "segf")
    tm = make_segformer(d)
    m = ttpu.AutoModelForSemanticSegmentation.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PX)).logits
    assert np.abs(np.asarray(out) - ref).max() < 3e-5


def test_segmentation_loss_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "segf_loss")
    tm = make_segformer(d)
    m = ttpu.AutoModelForSemanticSegmentation.from_pretrained(d, dtype="float32")
    lab = np.random.default_rng(1).integers(0, 3, size=(2, 64, 64))
    lab[0, :8] = 255  # ignore_index region
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX), labels=torch.tensor(lab)).loss
    out = m(m.params, pixel_values=jnp.asarray(PX), labels=jnp.asarray(lab)).loss
    assert abs(float(out) - float(ref)) < 1e-5


def test_image_segmentation_pipeline(tmp_path):
    d = str(tmp_path / "segf_pipe")
    make_segformer(d, id2label={0: "sky", 1: "road", 2: "car"},
                   label2id={"sky": 0, "road": 1, "car": 2})
    json.dump({"image_processor_type": "SegformerImageProcessor",
               "size": {"height": 64, "width": 64}, "do_resize": True,
               "do_rescale": True, "do_normalize": True,
               "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5]},
              open(f"{d}/preprocessor_config.json", "w"))
    pipe = ttpu.pipeline("image-segmentation", model=d)
    img = np.random.default_rng(0).integers(0, 255, size=(3, 64, 64)).astype(np.uint8)
    out = pipe(img)
    assert isinstance(out, list) and len(out) >= 1
    assert out[0]["mask"].shape == (64, 64)
    total = sum(r["mask"].sum() for r in out)
    assert total == 64 * 64  # masks partition the image


def test_glpn_depth_estimation_parity(tmp_path):
    """GLPN: SegFormer encoder + selective-feature-fusion depth decoder."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GLPNConfig(num_channels=3, num_encoder_blocks=2, depths=[1, 1],
                                  sr_ratios=[2, 1], hidden_sizes=[8, 16], patch_sizes=[7, 3],
                                  strides=[4, 2], num_attention_heads=[1, 2], mlp_ratios=[2, 2],
                                  decoder_hidden_size=8, max_depth=10, drop_path_rate=0.0)
    tm = transformers.GLPNForDepthEstimation(cfg).eval()
    d = str(tmp_path / "glpn")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForDepthEstimation.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX)).predicted_depth.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PX)).predicted_depth
    assert np.abs(np.asarray(out) - ref).max() < 3e-5
    # SiLog loss smoke (reference SiLogLoss)
    lab = np.abs(np.random.default_rng(1).normal(size=(2, 64, 64))) + 0.1
    with torch.no_grad():
        rl = tm(torch.from_numpy(PX), labels=torch.tensor(lab, dtype=torch.float32)).loss
    ol = m(m.params, pixel_values=jnp.asarray(PX), labels=jnp.asarray(lab)).loss
    assert abs(float(ol) - float(rl)) < 1e-4


def test_depth_estimation_pipeline(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GLPNConfig(num_channels=3, num_encoder_blocks=2, depths=[1, 1],
                                  sr_ratios=[2, 1], hidden_sizes=[8, 16], patch_sizes=[7, 3],
                                  strides=[4, 2], num_attention_heads=[1, 2], mlp_ratios=[2, 2],
                                  decoder_hidden_size=8, max_depth=10, drop_path_rate=0.0)
    d = str(tmp_path / "glpn_pipe")
    transformers.GLPNForDepthEstimation(cfg).eval().save_pretrained(d, safe_serialization=True)
    json.dump({"image_processor_type": "GLPNImageProcessor",
               "size": {"height": 64, "width": 64}, "do_resize": True,
               "do_rescale": True, "do_normalize": False},
              open(f"{d}/preprocessor_config.json", "w"))
    pipe = ttpu.pipeline("depth-estimation", model=d)
    img = np.random.default_rng(0).integers(0, 255, size=(3, 64, 64)).astype(np.uint8)
    out = pipe(img)
    assert out["predicted_depth"].shape == (64, 64)
    assert out["depth"].dtype == np.uint8
