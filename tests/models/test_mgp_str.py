"""MGP-STR parity vs torch: ViT encoder + A^3 token learners."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_mgp_str_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.MgpstrConfig(
        image_size=[16, 32], patch_size=4, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, max_token_length=7,
        num_character_labels=11, num_bpe_labels=13, num_wordpiece_labels=17)
    tm = transformers.MgpstrForSceneTextRecognition(cfg).eval()
    d = str(tmp_path / "mgp")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(1, 3, 16, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px))
    out = m(m.params, pixel_values=px)
    for i, name in enumerate(("char", "bpe", "wp")):
        diff = max_abs_diff(out.logits[i], ref.logits[i].numpy())
        assert diff < 3e-5, (name, diff)
