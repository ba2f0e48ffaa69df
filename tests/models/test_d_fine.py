"""D-FINE parity vs torch: FDR decoder over RT-DETR hybrid encoder."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers):
    return transformers.DFineConfig(
        backbone_config=dict(
            model_type="hgnet_v2", embeddings_hidden_dim=8,
            hidden_sizes=[16, 32, 64], depths=[1, 1, 1],
            stem_channels=[3, 8, 8], stage_in_channels=[8, 16, 32],
            stage_mid_channels=[8, 8, 16], stage_out_channels=[16, 32, 64],
            stage_num_of_layers=[1, 1, 1], stage_num_blocks=[1, 1, 1],
            stage_downsample=[False, True, True],
            stage_light_block=[False, False, True],
            stage_kernel_size=[3, 3, 5], stage_numb_of_layers=[1, 1, 1],
            out_indices=[1, 2, 3]),
        encoder_hidden_dim=32, d_model=32, encoder_in_channels=[16, 32, 64],
        decoder_in_channels=[32, 32, 32], encoder_layers=1, decoder_layers=2,
        num_queries=10, num_denoising=0, decoder_attention_heads=4,
        num_labels=5, encoder_ffn_dim=64, decoder_ffn_dim=64, eval_size=None,
        feat_strides=[8, 16, 32], max_num_bins=8, num_feature_levels=3)


def test_d_fine_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.DFineForObjectDetection(_cfg(transformers)).eval()
    # the tiny random HGNet collapses to near-constant features, tying every
    # encoder top-k score (torch/jax break ties differently, which is not a
    # model defect); perturb all params so scores are distinct
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.3)
    d = str(tmp_path / "dfine")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = (2 * np.random.default_rng(0).normal(size=(1, 3, 64, 64))).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px))
    out = m(m.params, pixel_values=px)
    assert out.logits.shape == tuple(ref.logits.shape)
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 1e-4, \
        max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy())
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 1e-4, \
        max_abs_diff(out.logits, ref.logits.numpy())
