"""Table Transformer parity vs torch: DETR with pre-norm layers + final
encoder layernorm."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)


def test_logit_and_box_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.TableTransformerConfig(
        use_timm_backbone=False, use_pretrained_backbone=False,
        backbone_config=transformers.ResNetConfig(
            embedding_size=8, hidden_sizes=[16, 32], depths=[1, 1],
            layer_type="basic", out_features=["stage2"]),
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=32, decoder_ffn_dim=32, num_queries=6, num_labels=3)
    tm = transformers.TableTransformerForObjectDetection(cfg).eval()
    d = str(tmp_path / "tt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForObjectDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX))
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref.logits.numpy()).max() < 3e-5
    assert np.abs(np.asarray(out.pred_boxes) - ref.pred_boxes.numpy()).max() < 3e-5
