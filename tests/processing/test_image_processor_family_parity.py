"""Per-family image-processor parity vs the installed torch reference.

Every processor is constructed FROM THE REFERENCE'S OWN CONFIG (to_dict), so
the test checks semantics (crop_pct, offsets, channel flips, pad orders),
not merely default values. pil_exact mode must reproduce the reference
pixel_values bit-for-bit; families whose reference pipeline resamples in
float (nearest/lanczos subtleties) assert tight numeric agreement instead.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import importlib  # noqa: E402


def _family(mod_name):
    return importlib.import_module(f"transformers_tpu.models.{mod_name}")

SHAPES = [(480, 640), (37, 53), (224, 224), (301, 157)]


def _images():
    rng = np.random.default_rng(11)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for h, w in SHAPES]


# (reference class name, ours module.class, exact?)
CASES = [
    ("ConvNextImageProcessor", "convnext.ConvNextImageProcessor", True),
    ("PoolFormerImageProcessor", "poolformer.PoolFormerImageProcessor", True),
    ("SegformerImageProcessor", "segformer.SegformerImageProcessor", True),
    ("BeitImageProcessor", "beit.BeitImageProcessor", True),
    ("MobileViTImageProcessor", "mobilevit.MobileViTImageProcessor", True),
    ("MobileNetV2ImageProcessor", "mobilenet_v2.MobileNetV2ImageProcessor", True),
    ("MobileNetV1ImageProcessor", "mobilenet_v2.MobileNetV1ImageProcessor", True),
    ("DPTImageProcessor", "dpt.DPTImageProcessor", True),
    ("GLPNImageProcessor", "glpn.GLPNImageProcessor", True),
    # constructed with resample=3: the v4 oracle's thumbnail hardcodes its
    # BICUBIC default while v5 (and ours) thread the configured resample —
    # with bicubic configured the two pipelines coincide
    ("DonutImageProcessor", "donut.DonutImageProcessor", True),
    ("NougatImageProcessor", "donut.NougatImageProcessor", True),
    ("OwlViTImageProcessor", "owlvit.OwlViTImageProcessor", True),
    ("LevitImageProcessor", "levit.LevitImageProcessor", True),
    ("DeiTImageProcessor", "deit.DeiTImageProcessor", True),
    ("BitImageProcessor", "bit.BitImageProcessor", True),
    ("PvtImageProcessor", "pvt.PvtImageProcessor", True),
    ("ViltImageProcessor", "vilt.ViltImageProcessor", False),
    ("EfficientNetImageProcessor", "efficientnet.EfficientNetImageProcessor", True),
]


def _resolve(path):
    mod_name, cls_name = path.split(".")
    return getattr(_family(mod_name), cls_name)


def _build_pair(ref_name, ours_path):
    ref_cls = getattr(transformers, ref_name, None)
    if ref_cls is None:
        pytest.skip(f"installed reference lacks {ref_name}")
    ctor = {"resample": 3} if ref_name in ("DonutImageProcessor",
                                           "NougatImageProcessor") else {}
    theirs = ref_cls(**ctor)
    cfg = {k: v for k, v in theirs.to_dict().items()
           if k not in ("image_processor_type", "processor_class")}
    ours = _resolve(ours_path)(**cfg)
    return theirs, ours


@pytest.mark.parametrize("ref_name,ours_path,exact",
                         CASES, ids=[c[0] for c in CASES])
def test_family_pixel_parity(ref_name, ours_path, exact):
    theirs, ours = _build_pair(ref_name, ours_path)
    imgs = _images()
    try:
        ref = theirs(images=imgs, return_tensors="np")
        got = ours.preprocess(imgs, pil_exact=True, return_tensors="np")
        r, g = np.asarray(ref["pixel_values"]), np.asarray(got["pixel_values"])
        shapes_differ = r.shape != g.shape
    except ValueError:
        # the reference itself cannot batch variable-size outputs: compare
        # image by image below
        shapes_differ = True
        r = g = None
    if shapes_differ and len(SHAPES) > 1:
        # variable-size families can't batch different inputs: compare per image
        for im in imgs:
            r1 = np.asarray(theirs(images=[im], return_tensors="np")["pixel_values"])
            g1 = np.asarray(ours.preprocess([im], pil_exact=True,
                                            return_tensors="np")["pixel_values"])
            assert r1.shape == g1.shape, (ref_name, r1.shape, g1.shape)
            if exact:
                assert np.array_equal(r1, g1), \
                    f"{ref_name}: maxdiff {np.abs(r1 - g1).max()}"
            else:
                np.testing.assert_allclose(g1, r1, atol=1e-5)
        return
    assert r.shape == g.shape, (ref_name, r.shape, g.shape)
    if exact:
        assert np.array_equal(r, g), f"{ref_name}: maxdiff {np.abs(r - g).max()}"
    else:
        np.testing.assert_allclose(g, r, atol=1e-5)


def test_segmentation_maps_and_reduce_labels():
    theirs = transformers.SegformerImageProcessor(do_reduce_labels=True)
    ours = _resolve("segformer.SegformerImageProcessor")(do_reduce_labels=True)
    img = _images()[0]
    seg = np.random.default_rng(0).integers(0, 10, size=img.shape[:2]).astype(np.uint8)
    ref = theirs(images=[img], segmentation_maps=[seg], return_tensors="np")
    got = ours.preprocess([img], segmentation_maps=[seg], pil_exact=True,
                          return_tensors="np")
    assert np.array_equal(np.asarray(ref["labels"]), np.asarray(got["labels"]))


def test_imagegpt_cluster_quantization():
    rng = np.random.default_rng(3)
    clusters = rng.uniform(-1, 1, size=(512, 3)).astype(np.float32)
    ref_cls = getattr(transformers, "ImageGPTImageProcessor", None)
    if ref_cls is None:
        pytest.skip("no reference ImageGPTImageProcessor")
    theirs = ref_cls(clusters=clusters)
    ours = _resolve("imagegpt.ImageGPTImageProcessor")(clusters=clusters)
    img = _images()[0]
    ref = theirs(images=[img], return_tensors="np")["input_ids"]
    got = np.asarray(ours.preprocess([img], return_tensors="np")["input_ids"])
    agreement = float(np.mean(np.asarray(ref) == got))
    assert agreement > 0.99, agreement  # ties at cluster boundaries aside


def test_owlvit_box_postprocess():
    class Out:
        logits = np.array([[[3.0, -1.0], [-2.0, 0.5]]], np.float32)
        pred_boxes = np.array([[[0.5, 0.5, 0.2, 0.2], [0.25, 0.25, 0.1, 0.1]]],
                              np.float32)

    ours = _resolve("owlvit.OwlViTImageProcessor")()
    res = ours.post_process_object_detection(Out(), threshold=0.5,
                                             target_sizes=[(100, 200)])
    assert len(res) == 1
    np.testing.assert_allclose(res[0]["boxes"][0], [80.0, 40.0, 120.0, 60.0],
                               atol=1e-4)
    assert res[0]["labels"][0] == 0
