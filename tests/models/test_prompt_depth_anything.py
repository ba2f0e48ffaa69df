"""Prompt Depth Anything parity vs torch: prompt-depth conv adapters at every
fusion scale and metric rescaling from the prompt's min/max range."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _make(tmp_path):
    torch.manual_seed(0)
    bb = dict(model_type="dinov2", hidden_size=32, num_hidden_layers=4,
              num_attention_heads=4, mlp_ratio=2, image_size=32, patch_size=8,
              out_indices=[1, 2, 3, 4], apply_layernorm=True,
              reshape_hidden_states=False)
    cfg = transformers.PromptDepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=16,
        neck_hidden_sizes=[8, 16, 24, 32], reassemble_hidden_size=32,
        patch_size=8, depth_estimation_type="metric")
    tm = transformers.PromptDepthAnythingForDepthEstimation(cfg).eval()
    d = str(tmp_path / "pda")
    tm.save_pretrained(d, safe_serialization=True)
    return tm, d


def test_prompt_depth_anything_parity(tmp_path):
    from transformers_tpu.models.prompt_depth_anything import (
        PromptDepthAnythingForDepthEstimation,
    )

    tm, d = _make(tmp_path)
    m = PromptDepthAnythingForDepthEstimation.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    prompt = (rng.random((1, 1, 8, 8)) * 3 + 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px),
                 prompt_depth=torch.tensor(prompt)).predicted_depth.numpy()
        ref_noprompt = tm(pixel_values=torch.tensor(px)).predicted_depth.numpy()
    out = m(m.params, pixel_values=jnp.asarray(px),
            prompt_depth=jnp.asarray(prompt)).predicted_depth
    assert max_abs_diff(out, ref) < 1e-4
    out2 = m(m.params, pixel_values=jnp.asarray(px)).predicted_depth
    assert max_abs_diff(out2, ref_noprompt) < 1e-4
