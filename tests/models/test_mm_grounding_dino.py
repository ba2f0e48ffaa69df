"""MM-Grounding-DINO parity vs torch: the scaled+biased contrastive head on
top of the Grounding-DINO fusion/two-stage/refinement pipeline."""

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
    return transformers.MMGroundingDinoConfig(
        backbone_config=dict(model_type="resnet", embedding_size=8,
                             hidden_sizes=[8, 16, 32, 64], depths=[1, 1, 1, 1],
                             out_features=["stage2", "stage3", "stage4"]),
        text_config=dict(model_type="bert", vocab_size=1200, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, max_position_embeddings=64),
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_feature_levels=4,
        encoder_n_points=2, decoder_n_points=2, num_queries=12,
        max_text_len=16, fusion_droppath=0.0)


def test_mm_grounding_dino_parity(tmp_path):
    from transformers_tpu.models.mm_grounding_dino import (
        MMGroundingDinoForObjectDetection,
    )

    torch.manual_seed(0)
    tm = transformers.MMGroundingDinoForObjectDetection(_cfg()).eval()
    d = str(tmp_path / "mmgdino")
    tm.save_pretrained(d, safe_serialization=True)

    m = MMGroundingDinoForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    px = np.random.default_rng(0).random((1, 3, 128, 128)).astype(np.float32)
    ids = np.array([[101, 500, 501, 1012, 600, 601, 1012, 102]], np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px),
                 input_ids=torch.from_numpy(ids))
    out = m(m.params, pixel_values=jnp.asarray(px), input_ids=jnp.asarray(ids))
    assert out.logits.shape == tuple(ref.logits.shape)
    fin = np.isfinite(ref.logits.numpy())
    got = np.asarray(out.logits)
    assert np.array_equal(np.isfinite(got), fin)
    assert np.abs(got[fin] - ref.logits.numpy()[fin]).max() < 1e-4
    assert max_abs_diff(out.pred_boxes, ref.pred_boxes.numpy()) < 1e-4
