"""Parity for AST, I-JEPA, ViT-MSN, ViViT vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

RNG = np.random.default_rng(0)
TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64)


def test_ast_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.audio_spectrogram_transformer import \
        ASTForAudioClassification

    torch.manual_seed(0)
    cfg = transformers.ASTConfig(**TINY, patch_size=8, frequency_stride=8,
                                 time_stride=8, max_length=32, num_mel_bins=16,
                                 num_labels=3)
    tm = transformers.ASTForAudioClassification(cfg).eval()
    d = str(tmp_path / "ast")
    tm.save_pretrained(d, safe_serialization=True)
    m = ASTForAudioClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = RNG.normal(size=(1, 32, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_values=torch.from_numpy(x)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(x))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_ijepa_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.ijepa import IJepaForImageClassification

    torch.manual_seed(0)
    cfg = transformers.IJepaConfig(**TINY, image_size=32, patch_size=8, num_labels=3)
    tm = transformers.IJepaForImageClassification(cfg).eval()
    d = str(tmp_path / "ijepa")
    tm.save_pretrained(d, safe_serialization=True)
    m = IJepaForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = RNG.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(x)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(x))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_vit_msn_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.vit_msn import ViTMSNForImageClassification

    torch.manual_seed(0)
    cfg = transformers.ViTMSNConfig(**TINY, image_size=32, patch_size=8, num_labels=3)
    tm = transformers.ViTMSNForImageClassification(cfg).eval()
    d = str(tmp_path / "vitmsn")
    tm.save_pretrained(d, safe_serialization=True)
    m = ViTMSNForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = RNG.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(x)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(x))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_vivit_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.vivit import VivitForVideoClassification

    torch.manual_seed(0)
    cfg = transformers.VivitConfig(**TINY, image_size=16, num_frames=4,
                                   tubelet_size=[2, 8, 8], num_labels=3)
    tm = transformers.VivitForVideoClassification(cfg).eval()
    d = str(tmp_path / "vivit")
    tm.save_pretrained(d, safe_serialization=True)
    m = VivitForVideoClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = RNG.normal(size=(1, 4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(x)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(x))
    assert max_abs_diff(out.logits, ref) < 5e-5
