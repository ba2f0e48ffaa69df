"""SAM2 parity vs torch: Hiera backbone with query pooling + windowed blocks,
FPN neck, prompt encoder, object-score two-way mask decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.models.sam2 import Sam2Model  # noqa: E402

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Sam2Config(
        vision_config=dict(
            backbone_config=dict(hidden_size=8, num_attention_heads=1,
                                 blocks_per_stage=[1, 1, 2, 1],
                                 embed_dim_per_stage=[8, 16, 32, 64],
                                 num_attention_heads_per_stage=[1, 2, 4, 8],
                                 window_size_per_stage=[4, 2, 2, 2],
                                 global_attention_blocks=[3],
                                 window_positional_embedding_background_size=[4, 4],
                                 image_size=[64, 64]),
            backbone_channel_list=[64, 32, 16, 8],
            backbone_feature_sizes=[[16, 16], [8, 8], [4, 4]],
            fpn_hidden_size=32),
        prompt_encoder_config=dict(hidden_size=32, image_size=64, patch_size=16,
                                   mask_input_channels=8),
        mask_decoder_config=dict(hidden_size=32, num_attention_heads=4, mlp_dim=64,
                                 iou_head_hidden_dim=32),
    )
    tm = transformers.Sam2Model(cfg).eval()
    d = str(tmp_path_factory.mktemp("sam2") / "ckpt")
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_sam2_points_parity(ckpt):
    import torch

    d, tm = ckpt
    m = Sam2Model.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    pix = RNG.normal(size=(1, 3, 64, 64)).astype(np.float32)
    points = np.array([[[[16.0, 20.0], [40.0, 12.0]]]], np.float32)  # [B,P,N,2]
    labels = np.array([[[1, 0]]], np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(pix),
                 input_points=torch.from_numpy(points),
                 input_labels=torch.from_numpy(labels), multimask_output=True)
    out = m(m.params, pixel_values=jnp.asarray(pix), input_points=jnp.asarray(points),
            input_labels=jnp.asarray(labels), multimask_output=True)
    md = np.abs(np.asarray(out.pred_masks) - ref.pred_masks.numpy()).max()
    i_d = np.abs(np.asarray(out.iou_scores) - ref.iou_scores.numpy()).max()
    assert md < 5e-4, f"mask diff {md}"
    assert i_d < 5e-5, f"iou diff {i_d}"


def test_sam2_no_prompt_single_mask(ckpt):
    """No prompts → dummy -1 point; single-mask path exercises the dynamic
    stability fallback."""
    import torch

    d, tm = ckpt
    m = Sam2Model.from_pretrained(d, dtype="float32")
    pix = RNG.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(pix), multimask_output=False)
    out = m(m.params, pixel_values=jnp.asarray(pix), multimask_output=False)
    md = np.abs(np.asarray(out.pred_masks) - ref.pred_masks.numpy()).max()
    assert md < 5e-4, f"mask diff {md}"
    od = np.abs(np.asarray(out.object_score_logits) - ref.object_score_logits.numpy()).max()
    assert od < 5e-5, f"obj score diff {od}"


def test_sam2_boxes_parity(ckpt):
    import torch

    d, tm = ckpt
    m = Sam2Model.from_pretrained(d, dtype="float32")
    pix = RNG.normal(size=(1, 3, 64, 64)).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 48.0, 40.0]]], np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(pix),
                 input_boxes=torch.from_numpy(boxes), multimask_output=True)
    out = m(m.params, pixel_values=jnp.asarray(pix), input_boxes=jnp.asarray(boxes),
            multimask_output=True)
    md = np.abs(np.asarray(out.pred_masks) - ref.pred_masks.numpy()).max()
    assert md < 5e-4, f"mask diff {md}"
