"""SegGPT parity vs torch: in-context segmentation ViT with rel-pos."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _tiny(transformers):
    return transformers.SegGptConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        image_size=[64, 32], patch_size=16, mlp_dim=64,
        pretrain_image_size=32, decoder_hidden_size=8, merge_index=1,
        intermediate_hidden_state_indices=[1, 3])


def _inputs():
    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ppx = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    pmask = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    return px, ppx, pmask


def test_seggpt_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.SegGptForImageSegmentation(_tiny(transformers)).eval()
    # rel-pos and tokens init to zeros; randomize so parity is non-trivial
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    d = str(tmp_path / "seggpt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px, ppx, pmask = _inputs()
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px),
                 prompt_pixel_values=torch.tensor(ppx),
                 prompt_masks=torch.tensor(pmask)).pred_masks.numpy()
    out = m(m.params, pixel_values=px, prompt_pixel_values=ppx,
            prompt_masks=pmask).pred_masks
    assert out.shape == ref.shape
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)


def test_seggpt_loss(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.SegGptForImageSegmentation(_tiny(transformers)).eval()
    d = str(tmp_path / "seggpt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    px, ppx, pmask = _inputs()
    labels = np.random.default_rng(3).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px),
                 prompt_pixel_values=torch.tensor(ppx),
                 prompt_masks=torch.tensor(pmask),
                 labels=torch.tensor(labels)).loss.item()
    out = m(m.params, pixel_values=px, prompt_pixel_values=ppx,
            prompt_masks=pmask, labels=labels)
    assert abs(float(out.loss) - ref) < 1e-5, (float(out.loss), ref)
