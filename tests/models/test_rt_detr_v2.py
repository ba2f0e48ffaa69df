"""RT-DETRv2 parity vs torch (v2 deformable attention, default + discrete)."""

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
           anchor_image_size=None, decoder_n_levels=3)

rng = np.random.default_rng(0)
PIXELS = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)


@pytest.mark.parametrize("method", ["default", "discrete"])
def test_object_detection_parity(tmp_path, method):
    import torch
    import transformers

    cfg = transformers.RTDetrV2Config(
        backbone_config=transformers.RTDetrResNetConfig(**BACKBONE),
        decoder_method=method, **CFG)
    torch.manual_seed(0)
    tm = transformers.RTDetrV2ForObjectDetection(cfg).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for _, param in tm.named_parameters():
            param.normal_(0.0, 0.08, generator=g)
        for mod in tm.modules():
            if hasattr(mod, "running_var") and mod.running_var is not None:
                mod.running_var.uniform_(0.6, 1.4, generator=g)
                mod.running_mean.normal_(0.0, 0.05, generator=g)
    d = str(tmp_path)
    tm.save_pretrained(d, safe_serialization=True)

    from transformers_tpu.models.rt_detr_v2 import RTDetrV2ForObjectDetection

    m = RTDetrV2ForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(PIXELS))
    out = m(m.params, pixel_values=jnp.asarray(PIXELS))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 5e-4
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 1e-4
