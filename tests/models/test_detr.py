"""DETR + ResNet parity vs torch: backbone, transformer, detection heads,
Hungarian-matched loss, post-processing, pipeline."""

import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)


def make_detr(tmp_dir, **over):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.DetrConfig(
        use_timm_backbone=False, use_pretrained_backbone=False,
        backbone_config=transformers.ResNetConfig(
            embedding_size=8, hidden_sizes=[16, 32], depths=[1, 1],
            layer_type="basic", out_features=["stage2"]),
        d_model=32, encoder_layers=2, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=32, decoder_ffn_dim=32,
        num_queries=6, num_labels=3, **over)
    tm = transformers.DetrForObjectDetection(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_resnet_classification_parity(tmp_path):
    import torch
    import transformers

    for layer_type in ("bottleneck", "basic"):
        torch.manual_seed(0)
        cfg = transformers.ResNetConfig(embedding_size=8, hidden_sizes=[16, 32],
                                        depths=[2, 2], layer_type=layer_type, num_labels=3)
        tm = transformers.ResNetForImageClassification(cfg).eval()
        d = str(tmp_path / f"rn_{layer_type}")
        tm.save_pretrained(d, safe_serialization=True)
        m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
        assert not m.load_report.missing_keys
        assert not m.load_report.unexpected_keys
        import torch as _t

        with _t.no_grad():
            ref = tm(_t.from_numpy(PX)).logits.numpy()
        out = m(m.params, pixel_values=jnp.asarray(PX)).logits
        assert np.abs(np.asarray(out) - ref).max() < 3e-5


def test_detr_logit_and_box_parity(tmp_path):
    import torch

    d = str(tmp_path / "detr")
    tm = make_detr(d)
    m = ttpu.AutoModelForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX))
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref.logits.numpy()).max() < 3e-5
    assert np.abs(np.asarray(out.pred_boxes) - ref.pred_boxes.numpy()).max() < 3e-5


def test_detr_hungarian_loss_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "detr_loss")
    tm = make_detr(d)
    m = ttpu.AutoModelForObjectDetection.from_pretrained(d, dtype="float32")
    labels = [
        {"class_labels": np.array([0, 2]),
         "boxes": np.array([[0.5, 0.5, 0.2, 0.3], [0.3, 0.7, 0.1, 0.1]], np.float32)},
        {"class_labels": np.array([1]),
         "boxes": np.array([[0.6, 0.4, 0.3, 0.2]], np.float32)},
    ]
    tl = [{"class_labels": torch.tensor(l["class_labels"]),
           "boxes": torch.tensor(l["boxes"])} for l in labels]
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX), labels=tl)
    out = m(m.params, pixel_values=jnp.asarray(PX), labels=labels)
    assert abs(float(out.loss) - float(ref.loss)) < 1e-4
    for k in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        assert abs(float(out.loss_dict[k]) - float(ref.loss_dict[k])) < 1e-4, k


def test_object_detection_pipeline(tmp_path):
    d = str(tmp_path / "detr_pipe")
    make_detr(d, id2label={0: "cat", 1: "dog", 2: "bird"},
              label2id={"cat": 0, "dog": 1, "bird": 2})
    json.dump({"image_processor_type": "DetrImageProcessor",
               "size": {"height": 64, "width": 64}, "do_resize": True,
               "do_rescale": True, "do_normalize": True,
               "image_mean": [0.485, 0.456, 0.406], "image_std": [0.229, 0.224, 0.225]},
              open(f"{d}/preprocessor_config.json", "w"))
    pipe = ttpu.pipeline("object-detection", model=d)
    img = np.random.default_rng(0).integers(0, 255, size=(3, 64, 64)).astype(np.uint8)
    out = pipe(img, threshold=0.0)
    assert isinstance(out, list)
    if out:
        assert {"score", "label", "box"} <= set(out[0].keys())


def test_convnext_classification_parity(tmp_path):
    """ConvNeXt: depthwise 7x7 + channels-last LN + layer scale."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ConvNextConfig(num_channels=3, patch_size=4, num_stages=2,
                                      hidden_sizes=[16, 32], depths=[2, 2], num_labels=3)
    tm = transformers.ConvNextForImageClassification(cfg).eval()
    d = str(tmp_path / "cnext")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX[:, :, :32, :32])).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PX[:, :, :32, :32])).logits
    assert np.abs(np.asarray(out) - ref).max() < 3e-5
