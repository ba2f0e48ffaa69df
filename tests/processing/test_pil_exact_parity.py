"""Bit-for-bit preprocessing parity (BASELINE.md north star; SURVEY §7 hard
part #2): the ``pil_exact`` path must reproduce the reference image
processors' pixel_values EXACTLY — zero ULP of difference — via the
fixed-point PIL resample replication in image_transforms.pil_exact_resize."""

import sys
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.models.clip import CLIPImageProcessor  # noqa: E402
from transformers_tpu.models.siglip import SiglipImageProcessor  # noqa: E402
from transformers_tpu.models.vit import ViTImageProcessor  # noqa: E402

SHAPES = [(480, 640), (37, 53), (224, 224), (301, 157), (64, 1024)]


def _images():
    rng = np.random.default_rng(7)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for h, w in SHAPES]


@pytest.mark.parametrize("theirs_cls,ours_cls", [
    (transformers.ViTImageProcessor, ViTImageProcessor),
    (transformers.CLIPImageProcessor, CLIPImageProcessor),
    (transformers.SiglipImageProcessor, SiglipImageProcessor),
], ids=["vit", "clip", "siglip"])
def test_pixel_values_bit_exact(theirs_cls, ours_cls):
    imgs = _images()
    ref = theirs_cls()(images=imgs, return_tensors="np")["pixel_values"]
    got = np.asarray(ours_cls().preprocess(imgs, pil_exact=True,
                                           return_tensors="np")["pixel_values"])
    assert ref.dtype == got.dtype == np.float32
    assert np.array_equal(ref, got), (
        f"max diff {np.abs(ref - got).max()}, {np.sum(ref != got)} differing elements")


def test_pil_exact_resize_matches_pil_direct():
    from PIL import Image

    from transformers_tpu.image_transforms import pil_exact_resize

    rng = np.random.default_rng(0)
    for (h, w), (oh, ow), rs in [((480, 640), (224, 224), "bilinear"),
                                 ((37, 53), (224, 224), "bicubic"),
                                 ((100, 100), (7, 13), "bilinear"),
                                 ((16, 16), (64, 48), "bicubic")]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        pil = np.asarray(Image.fromarray(img).resize(
            (ow, oh), resample=Image.BILINEAR if rs == "bilinear" else Image.BICUBIC))
        ours = pil_exact_resize(img.transpose(2, 0, 1), (oh, ow), rs).transpose(1, 2, 0)
        assert np.array_equal(pil, ours), (h, w, oh, ow, rs)


def test_shortest_edge_truncation_matches_reference():
    """v5 get_resize_output_image_size truncates, not rounds
    (reference image_transforms.py:299)."""
    from transformers_tpu.image_transforms import get_resize_output_size

    # 480x640 @ shortest 224: 224*640/480 = 298.67 -> 298 (not 299)
    assert get_resize_output_size(480, 640, 224) == (224, 298)
    assert get_resize_output_size(640, 480, 224) == (298, 224)
    # longest_edge cap uses the NEW aspect (reference :309)
    assert get_resize_output_size(480, 640, 224, longest_edge=250) == (187, 250)
