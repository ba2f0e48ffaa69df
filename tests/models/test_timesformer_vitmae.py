"""TimeSformer + ViT-MAE parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def test_timesformer_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.timesformer import \
        TimesformerForVideoClassification

    torch.manual_seed(0)
    cfg = transformers.TimesformerConfig(
        image_size=32, patch_size=8, num_frames=4, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        num_labels=5)
    tm = transformers.TimesformerForVideoClassification(cfg).eval()
    d = str(tmp_path / "tsf")
    tm.save_pretrained(d, safe_serialization=True)
    m = TimesformerForVideoClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(px))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_vit_mae_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.vit_mae import ViTMAEForPreTraining

    torch.manual_seed(0)
    cfg = transformers.ViTMAEConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, decoder_hidden_size=24,
        decoder_num_hidden_layers=2, decoder_num_attention_heads=4,
        decoder_intermediate_size=48, mask_ratio=0.5)
    tm = transformers.ViTMAEForPreTraining(cfg).eval()
    d = str(tmp_path / "mae")
    tm.save_pretrained(d, safe_serialization=True)
    m = ViTMAEForPreTraining.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    noise = rng.random((2, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(px), noise=torch.from_numpy(noise))
    out = m(m.params, pixel_values=jnp.asarray(px), noise=jnp.asarray(noise))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 5e-5
    assert max_abs_diff(out.mask, ref.mask.numpy()) == 0
    assert abs(float(out.loss) - float(ref.loss)) < 1e-5
