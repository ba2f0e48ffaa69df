"""SuperPoint + SuperGlue parity vs torch, and the keypoint-matching pipeline."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

SP_TINY = dict(encoder_hidden_sizes=[8, 8, 16, 16], decoder_hidden_size=32,
               descriptor_decoder_dim=16, keypoint_threshold=1e-4,
               max_keypoints=8, nms_radius=2, border_removal_distance=2)


@pytest.fixture(scope="module")
def sp_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("superpoint"))
    torch.manual_seed(0)
    cfg = transformers.SuperPointConfig(**SP_TINY)
    tm = transformers.SuperPointForKeypointDetection(cfg).eval()
    # random init collapses the score map to a constant (all-tied keypoints);
    # scale the weights so scores are distinct and ordering is well-defined
    with torch.no_grad():
        for par in tm.parameters():
            par.mul_(5.0)
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_superpoint_parity(sp_ckpt):
    import torch

    d, tm = sp_ckpt
    m = ttpu.AutoModelForKeypointDetection.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    rng = np.random.default_rng(0)
    g = rng.random((1, 1, 48, 64)).astype(np.float32)
    pixels = np.concatenate([g, g, g], axis=1)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels))
    out = m(m.params, pixel_values=jnp.asarray(pixels))
    n = int(ref.mask.sum())  # torch emits exactly the valid keypoints
    assert int(np.asarray(out.mask).sum()) == n
    assert max_abs_diff(np.asarray(out.keypoints)[0, :n], ref.keypoints[0, :n].numpy()) < 1e-5
    assert max_abs_diff(np.asarray(out.scores)[0, :n], ref.scores[0, :n].numpy()) < 1e-5
    assert max_abs_diff(np.asarray(out.descriptors)[0, :n], ref.descriptors[0, :n].numpy()) < 1e-4


@pytest.fixture(scope="module")
def sg_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("superglue"))
    torch.manual_seed(0)
    cfg = transformers.SuperGlueConfig(
        keypoint_detector_config=dict(SP_TINY),
        hidden_size=16, keypoint_encoder_sizes=[8, 8], num_attention_heads=2,
        gnn_layers_types=["self", "cross", "self", "cross"], sinkhorn_iterations=20,
        attn_implementation="eager")
    # descriptor dim must match hidden size
    cfg.keypoint_detector_config.descriptor_decoder_dim = 16
    tm = transformers.SuperGlueForKeypointMatching(cfg).eval()
    with torch.no_grad():
        for name, par in tm.named_parameters():
            if name.startswith("keypoint_detector"):
                par.mul_(5.0)
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_superglue_parity(sg_ckpt):
    import torch

    d, tm = sg_ckpt
    m = ttpu.AutoModelForKeypointMatching.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    rng = np.random.default_rng(0)
    g = rng.random((1, 2, 1, 48, 64)).astype(np.float32)
    pixels = np.concatenate([g, g, g], axis=2)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixels))
    out = m(m.params, pixel_values=jnp.asarray(pixels))
    tk = ref.matches.shape[-1]
    np.testing.assert_array_equal(np.asarray(out.matches)[:, :, :tk], ref.matches.numpy())
    assert max_abs_diff(np.asarray(out.matching_scores)[:, :, :tk],
                        ref.matching_scores.numpy()) < 1e-4


def test_keypoint_matching_pipeline(sg_ckpt):
    import json

    d, _ = sg_ckpt
    with open(Path(d) / "preprocessor_config.json", "w") as f:
        json.dump({"image_processor_type": "SuperGlueImageProcessor",
                   "size": {"height": 48, "width": 64}}, f)
    pipe = ttpu.pipeline("keypoint-matching", model=d)
    rng = np.random.default_rng(1)
    img0 = rng.integers(0, 255, (3, 48, 64), dtype=np.uint8)
    img1 = rng.integers(0, 255, (3, 48, 64), dtype=np.uint8)
    out = pipe([img0, img1])
    assert isinstance(out, list)
    for match in out:
        assert set(match) == {"keypoint_image_0", "keypoint_image_1", "score"}
        assert 0.0 <= match["score"] <= 1.0
