"""VideoMAE parity vs torch: tubelet Conv3d embeddings, fixed sinusoid
positions, legacy q/v-bias attention, mean-pool classification head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402


@pytest.mark.parametrize("mean_pooling", [True, False])
def test_video_classification_parity(mean_pooling, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.VideoMAEConfig(
        image_size=16, patch_size=8, num_channels=3, num_frames=4, tubelet_size=2,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, num_labels=3, use_mean_pooling=mean_pooling)
    tm = transformers.VideoMAEForVideoClassification(cfg).eval()
    d = str(tmp_path / f"vmae_{mean_pooling}")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForVideoClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    px = np.random.default_rng(0).normal(size=(2, 4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(px)).logits.numpy()
    out = m(m.params, pixel_values=jnp.asarray(px)).logits
    assert np.abs(np.asarray(out) - ref).max() < 3e-5


def test_video_classification_pipeline(tmp_path):
    import json

    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.VideoMAEConfig(
        image_size=16, patch_size=8, num_channels=3, num_frames=4, tubelet_size=2,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, num_labels=3,
        id2label={0: "run", 1: "jump", 2: "swim"}, label2id={"run": 0, "jump": 1, "swim": 2})
    d = str(tmp_path / "vmae_pipe")
    transformers.VideoMAEForVideoClassification(cfg).eval().save_pretrained(
        d, safe_serialization=True)
    json.dump({"video_processor_type": "VideoMAEVideoProcessor",
               "size": {"height": 16, "width": 16}, "do_resize": True,
               "do_rescale": True, "do_normalize": True, "do_sample_frames": True,
               "num_frames": 4, "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5]},
              open(f"{d}/video_preprocessor_config.json", "w"))
    pipe = ttpu.pipeline("video-classification", model=d)
    video = np.random.default_rng(0).integers(0, 255, size=(8, 3, 16, 16)).astype(np.uint8)
    out = pipe(video, top_k=2)
    assert len(out) == 2 and out[0]["label"] in ("run", "jump", "swim")
