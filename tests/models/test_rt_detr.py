"""RT-DETR parity vs torch: backbone, hybrid encoder, deformable decoder,
two-stage query selection, object-detection heads."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

BACKBONE = dict(embedding_size=8, hidden_sizes=[16, 24, 32, 40], depths=[1, 1, 1, 1],
                layer_type="bottleneck", out_indices=[2, 3, 4])
CFG = dict(encoder_hidden_dim=16, encoder_in_channels=[24, 32, 40],
           feat_strides=[8, 16, 32], encoder_layers=1, encoder_ffn_dim=32,
           encoder_attention_heads=2, encode_proj_layers=[2], d_model=16,
           num_queries=10, decoder_in_channels=[16, 16, 16], decoder_ffn_dim=32,
           num_feature_levels=3, decoder_n_points=2, decoder_layers=2,
           decoder_attention_heads=2, num_denoising=0, num_labels=7,
           anchor_image_size=None)

rng = np.random.default_rng(0)
PIXELS = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.RTDetrConfig(
        backbone_config=transformers.RTDetrResNetConfig(**BACKBONE), **CFG)
    torch.manual_seed(0)
    tm = transformers.RTDetrForObjectDetection(cfg).eval()
    # the default init (0.01-std convs into unit-variance BN stats) collapses
    # encoder scores to a constant, making top-k query selection an arbitrary
    # tie-break; re-randomize so the two-stage selection is meaningful
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for name, param in tm.named_parameters():
            param.normal_(0.0, 0.08, generator=g)
        for mod in tm.modules():
            if hasattr(mod, "running_var") and mod.running_var is not None:
                mod.running_var.uniform_(0.6, 1.4, generator=g)
                mod.running_mean.normal_(0.0, 0.05, generator=g)
    d = str(tmp_path_factory.mktemp("rtdetr"))
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_object_detection_parity(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.rt_detr import RTDetrForObjectDetection

    m = RTDetrForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(PIXELS))
    out = m(m.params, pixel_values=jnp.asarray(PIXELS))
    assert out.logits.shape == tuple(ref.logits.shape)
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 5e-4, \
        max_abs_diff(out.logits, ref.logits.numpy())
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 1e-4
    assert max_abs_diff(out.enc_topk_logits, ref.enc_topk_logits.numpy()) < 5e-4
    assert max_abs_diff(out.enc_topk_bboxes, ref.enc_topk_bboxes.numpy()) < 1e-4


def test_base_model_parity(ckpt):
    import torch
    import transformers

    d, tm = ckpt
    from transformers_tpu.models.rt_detr import RTDetrModel

    cfg = transformers.RTDetrConfig(
        backbone_config=transformers.RTDetrResNetConfig(**BACKBONE), **CFG)
    base = transformers.RTDetrModel(cfg).eval()
    base.load_state_dict(tm.model.state_dict(), strict=False)
    d2 = d + "_base"
    base.save_pretrained(d2, safe_serialization=True)
    m = RTDetrModel.from_pretrained(d2, dtype="float32")
    with torch.no_grad():
        ref = base(pixel_values=torch.from_numpy(PIXELS))
    out = m(m.params, pixel_values=jnp.asarray(PIXELS))
    assert max_abs_diff(out.last_hidden_state, ref.last_hidden_state.numpy()) < 5e-4
    assert max_abs_diff(out.intermediate_reference_points,
                        ref.intermediate_reference_points.numpy()) < 1e-4
