"""LeViT parity vs torch: conv stem + BN-linear attention with offset biases."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)


def _cfg(transformers, **kw):
    return transformers.LevitConfig(
        image_size=32, hidden_sizes=[16, 24, 32], num_attention_heads=[2, 3, 4],
        depths=[1, 1, 1], key_dim=[4, 4, 4], num_labels=3, **kw)


def test_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.LevitForImageClassification(_cfg(transformers)).eval()
    # randomize BN running stats so the BN path is actually exercised
    for mod in tm.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            mod.running_mean.normal_(0, 0.02)
            mod.running_var.uniform_(0.7, 1.3)
    d = str(tmp_path / "levit")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-4


def test_teacher_head_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.LevitForImageClassificationWithTeacher(
        _cfg(transformers)).eval()
    d = str(tmp_path / "levit_t")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.levit import LevitForImageClassificationWithTeacher

    m = LevitForImageClassificationWithTeacher.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(PX))
    out = m(m.params, pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.logits) - ref.logits.numpy()).max() < 5e-4
    assert np.abs(np.asarray(out.distillation_logits)
                  - ref.distillation_logits.numpy()).max() < 5e-4
