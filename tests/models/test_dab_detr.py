"""DAB-DETR parity vs torch: anchor-box queries, modulated sine attention,
in-decoder anchor refinement, PReLU FFNs."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(hidden_size=32, encoder_layers=2, decoder_layers=3,
           encoder_attention_heads=4, decoder_attention_heads=4,
           encoder_ffn_dim=48, decoder_ffn_dim=48, num_queries=8,
           num_labels=5, dropout=0.0,
           backbone=None, use_timm_backbone=False, use_pretrained_backbone=False,
           backbone_config=dict(model_type="resnet", embedding_size=8,
                                hidden_sizes=[8, 16, 32, 64], depths=[1, 1, 1, 1],
                                out_features=["stage4"]))


def test_dab_detr_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.DabDetrForObjectDetection(
        transformers.DabDetrConfig(**CFG)).eval()
    d = str(tmp_path / "dab")
    try:
        tm.save_pretrained(d, safe_serialization=True)
    except RuntimeError:
        # decoder.bbox_embed aliases bbox_predictor (shared tensors)
        tm.save_pretrained(d, safe_serialization=False)
    m = ttpu.AutoModelForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(px))
    out = m(m.params, pixel_values=jnp.asarray(px))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4, \
        max_abs_diff(out.logits, ref.logits.numpy())
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 2e-4
