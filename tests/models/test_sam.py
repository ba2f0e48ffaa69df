"""SAM parity vs torch: vision encoder, prompt encoder, mask decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vision_config=dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
                       image_size=32, patch_size=4, output_channels=16, window_size=2,
                       global_attn_indexes=[1], num_pos_feats=8, mlp_ratio=2.0),
    prompt_encoder_config=dict(hidden_size=16, image_size=32, patch_size=4,
                               mask_input_channels=8),
    mask_decoder_config=dict(hidden_size=16, num_attention_heads=2, mlp_dim=32,
                             iou_head_hidden_dim=16),
)


@pytest.fixture(scope="module")
def sam_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("sam"))
    torch.manual_seed(0)
    config = transformers.SamConfig(**TINY, attn_implementation="eager")
    tm = transformers.SamModel(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_point_prompt_parity(sam_ckpt):
    import torch

    d, tm = sam_ckpt
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    missing = [k for k in m.load_report.missing_keys]
    assert not missing, missing
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    points = np.array([[[[9.0, 12.0]]]], dtype=np.float32)  # [B, pb, n, 2]
    labels = np.array([[[1]]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels), input_points=torch.tensor(points),
                 input_labels=torch.tensor(labels))
    out = m(m.params, pixel_values=jnp.asarray(pixels), input_points=jnp.asarray(points),
            input_labels=jnp.asarray(labels))
    assert max_abs_diff(out.pred_masks, ref.pred_masks.numpy()) < 2e-4
    assert max_abs_diff(out.iou_scores, ref.iou_scores.numpy()) < 1e-4


def test_box_prompt_parity(sam_ckpt):
    import torch

    d, tm = sam_ckpt
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    boxes = np.array([[[4.0, 4.0, 20.0, 24.0]]], dtype=np.float32)  # [B, n, 4]
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels), input_boxes=torch.tensor(boxes))
    out = m(m.params, pixel_values=jnp.asarray(pixels), input_boxes=jnp.asarray(boxes))
    assert max_abs_diff(out.pred_masks, ref.pred_masks.numpy()) < 2e-4
    assert max_abs_diff(out.iou_scores, ref.iou_scores.numpy()) < 1e-4


def test_no_prompt_and_multipoint(sam_ckpt):
    import torch

    d, tm = sam_ckpt
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    # two point-batches of two points each, incl. a background point
    points = np.array([[[[9.0, 12.0], [3.0, 5.0]], [[20.0, 8.0], [14.0, 30.0]]]],
                      dtype=np.float32)
    labels = np.array([[[1, 0], [1, -1]]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels), input_points=torch.tensor(points),
                 input_labels=torch.tensor(labels), multimask_output=False)
    out = m(m.params, pixel_values=jnp.asarray(pixels), input_points=jnp.asarray(points),
            input_labels=jnp.asarray(labels), multimask_output=False)
    assert out.pred_masks.shape == tuple(ref.pred_masks.shape)
    assert max_abs_diff(out.pred_masks, ref.pred_masks.numpy()) < 2e-4


def test_mask_generation_pipeline(sam_ckpt, tmp_path):
    import json

    d, _ = sam_ckpt
    # write a preprocessor config scaled to the tiny model geometry
    with open(Path(d) / "preprocessor_config.json", "w") as f:
        json.dump({"image_processor_type": "SamImageProcessor",
                   "size": {"longest_edge": 32}, "pad_size": {"height": 32, "width": 32},
                   "mask_size": {"longest_edge": 8}}, f)
    pipe = ttpu.pipeline("mask-generation", model=d)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(3, 24, 30), dtype=np.uint8)
    out = pipe(image, points_per_side=4, points_per_batch=8,
               pred_iou_thresh=-1e9, stability_score_thresh=-1.0, box_nms_thresh=0.99)
    assert set(out) == {"masks", "scores"}
    assert len(out["masks"]) == len(out["scores"])
    if out["masks"]:
        assert out["masks"][0].shape == (24, 30)
        assert out["masks"][0].dtype == bool
