"""V-JEPA2 parity vs torch: encoder + predictor, masked predictor paths,
attentive-pooler classification."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

CFG = dict(patch_size=16, crop_size=32, frames_per_clip=4, tubelet_size=2,
           hidden_size=24, num_attention_heads=2, num_hidden_layers=2,
           mlp_ratio=2.0, num_pooler_layers=2, pred_hidden_size=24,
           pred_num_attention_heads=2, pred_num_hidden_layers=2,
           pred_num_mask_tokens=3, pred_mlp_ratio=2.0)

rng = np.random.default_rng(0)
VIDEO = rng.standard_normal((2, 4, 3, 32, 32)).astype(np.float32)


def build(tmp_path, cls_name="VJEPA2Model", **over):
    import torch
    import transformers

    cfg = transformers.VJEPA2Config(**{**CFG, **over})
    torch.manual_seed(0)
    tm = getattr(transformers, cls_name)(cfg).eval()
    if cls_name == "VJEPA2Model":
        with torch.no_grad():  # zero-init mask tokens otherwise
            tm.predictor.embeddings.mask_tokens.normal_()
    d = str(tmp_path)
    tm.save_pretrained(d, safe_serialization=True)
    import transformers_tpu.models.vjepa2 as mod

    m = getattr(mod, cls_name).from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    return tm, m


def test_encoder_predictor_parity(tmp_path):
    import torch

    tm, m = build(tmp_path / "a")
    with torch.no_grad():
        ref = tm(pixel_values_videos=torch.from_numpy(VIDEO))
    out = m(m.params, pixel_values_videos=jnp.asarray(VIDEO))
    assert max_abs_diff(out.last_hidden_state, ref.last_hidden_state.numpy()) < 1e-4
    assert max_abs_diff(out.predictor_last_hidden_state,
                        ref.predictor_output.last_hidden_state.numpy()) < 1e-4


def test_masked_predictor(tmp_path):
    import torch

    tm, m = build(tmp_path / "b")
    # 8 patches total (2 tubelets x 2x2 grid); context = first 5, target = last 3
    ctx = np.tile(np.arange(5)[None], (2, 1))
    tgt = np.tile(np.arange(5, 8)[None], (2, 1))
    with torch.no_grad():
        ref = tm(pixel_values_videos=torch.from_numpy(VIDEO),
                 context_mask=[torch.from_numpy(ctx)],
                 target_mask=[torch.from_numpy(tgt)])
    out = m(m.params, pixel_values_videos=jnp.asarray(VIDEO),
            context_mask=[jnp.asarray(ctx)], target_mask=[jnp.asarray(tgt)])
    assert max_abs_diff(out.masked_hidden_state,
                        ref.masked_hidden_state.numpy()) < 1e-4
    assert max_abs_diff(out.predictor_last_hidden_state,
                        ref.predictor_output.last_hidden_state.numpy()) < 1e-4


def test_video_classification(tmp_path):
    import torch

    tm, m = build(tmp_path / "c", cls_name="VJEPA2ForVideoClassification",
                  num_labels=5)
    with torch.no_grad():
        ref = tm(pixel_values_videos=torch.from_numpy(VIDEO)).logits.numpy()
    out = m(m.params, pixel_values_videos=jnp.asarray(VIDEO)).logits
    assert max_abs_diff(out, ref) < 1e-4
