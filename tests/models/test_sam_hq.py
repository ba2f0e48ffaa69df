"""SAM-HQ parity vs torch: HQ token + early-ViT fusion mask decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg():
    return transformers.SamHQConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=3,
                           num_attention_heads=4, image_size=32, patch_size=4,
                           output_channels=16, window_size=2,
                           global_attn_indexes=[1], num_pos_feats=8,
                           mlp_ratio=2.0),
        prompt_encoder_config=dict(hidden_size=16, image_size=32, patch_size=4,
                                   mask_input_channels=8),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 mlp_dim=32, iou_head_hidden_dim=16, vit_dim=32))


@pytest.mark.parametrize("multimask,hq_only", [(True, False), (False, True)])
def test_sam_hq_parity(tmp_path, multimask, hq_only):
    from transformers_tpu.models.sam_hq import SamHQModel

    torch.manual_seed(0)
    tm = transformers.SamHQModel(_cfg()).eval()
    d = str(tmp_path / f"samhq{multimask}{hq_only}")
    tm.save_pretrained(d, safe_serialization=True)

    m = SamHQModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    px = np.random.default_rng(0).random((1, 3, 32, 32)).astype(np.float32)
    pts = np.array([[[[8.0, 8.0]]]], dtype=np.float32)
    labs = np.array([[[1]]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px),
                 input_points=torch.from_numpy(pts),
                 input_labels=torch.from_numpy(labs),
                 multimask_output=multimask, hq_token_only=hq_only)
    out = m(m.params, pixel_values=jnp.asarray(px),
            input_points=jnp.asarray(pts), input_labels=jnp.asarray(labs),
            multimask_output=multimask, hq_token_only=hq_only)
    assert out.pred_masks.shape == tuple(ref.pred_masks.shape)
    assert max_abs_diff(out.pred_masks, ref.pred_masks.numpy()) < 5e-5
    assert max_abs_diff(out.iou_scores, ref.iou_scores.numpy()) < 5e-5
