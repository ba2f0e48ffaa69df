"""Qwen2-VL video processor + processor parity vs the installed reference."""

import sys
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))


def _video(t=6, h=48, w=64, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(t, h, w, 3), dtype=np.uint8)


def test_video_pixel_parity():
    # oracle: the installed (v4) reference routes videos through
    # Qwen2VLImageProcessor(videos=...) with the same smart_resize +
    # temporal patchify semantics the v5 video processor carries
    ref = transformers.Qwen2VLImageProcessor(
        min_pixels=56 * 56, max_pixels=28 * 28 * 128)
    from transformers_tpu.models.qwen2_vl import Qwen2VLVideoProcessor

    ours = Qwen2VLVideoProcessor(
        size={"shortest_edge": 56 * 56, "longest_edge": 28 * 28 * 128})

    vid = _video()
    r = ref(images=None, videos=[list(vid)], return_tensors="np")
    o = ours([vid], return_tensors="np")
    assert o["pixel_values_videos"].shape == tuple(r["pixel_values_videos"].shape)
    np.testing.assert_array_equal(np.asarray(o["video_grid_thw"]),
                                  np.asarray(r["video_grid_thw"]))
    # PIL bicubic vs our jax bicubic differ in filter details; same criterion
    # as the established image-processor parity test (mean < 0.1)
    diff = np.abs(np.asarray(o["pixel_values_videos"], np.float32)
                  - np.asarray(r["pixel_values_videos"], np.float32)).mean()
    assert diff < 0.1, diff


def test_video_odd_frames_padded():
    from transformers_tpu.models.qwen2_vl import Qwen2VLVideoProcessor

    ours = Qwen2VLVideoProcessor(
        size={"shortest_edge": 56 * 56, "longest_edge": 28 * 28 * 128})
    out = ours([_video(t=5)], return_tensors="np")
    # 5 frames pad to 6 -> grid_t = 3
    assert out["video_grid_thw"][0, 0] == 3


def test_frame_sampling_num_frames_and_fps():
    from transformers_tpu.models.qwen2_vl import Qwen2VLVideoProcessor
    from transformers_tpu.video_utils import VideoMetadata

    ours = Qwen2VLVideoProcessor(
        size={"shortest_edge": 56 * 56, "longest_edge": 28 * 28 * 128})
    vid = _video(t=16)
    s = ours.sample_frames(vid, num_frames=6)
    assert s.shape[0] == 6
    meta = VideoMetadata(total_num_frames=16, fps=8.0)
    s2 = ours.sample_frames(vid, metadata=meta, fps=4)
    assert s2.shape[0] == 8  # 2s of video at 4 fps, rounded to tps

    with pytest.raises(ValueError):
        ours.sample_frames(vid, num_frames=6, fps=4)


def test_processor_expands_image_and_video_tokens(tmp_path):
    from test_serve import make_tiny_tokenizer

    import transformers_tpu as ttpu
    from transformers_tpu.models.qwen2_vl import (
        Qwen2VLImageProcessor,
        Qwen2VLProcessor,
        Qwen2VLVideoProcessor,
    )

    make_tiny_tokenizer(str(tmp_path))
    tokenizer = ttpu.AutoTokenizer.from_pretrained(str(tmp_path))
    bounds = {"shortest_edge": 56 * 56, "longest_edge": 28 * 28 * 128}
    proc = Qwen2VLProcessor(
        image_processor=Qwen2VLImageProcessor(min_pixels=bounds["shortest_edge"],
                                              max_pixels=bounds["longest_edge"]),
        tokenizer=tokenizer,
        video_processor=Qwen2VLVideoProcessor(size=dict(bounds)),
        image_token="@", video_token="#")

    image = np.random.default_rng(0).integers(0, 255, (56, 56, 3), dtype=np.uint8)
    out = proc(text="@ and #", images=[image], videos=[_video()],
               return_tensors="np")
    at_id = tokenizer.encode("@")[0]
    hash_id = tokenizer.encode("#")[0]
    ids = out["input_ids"][0].tolist()
    n_img = int(np.prod(out["image_grid_thw"][0])) // 4
    n_vid = int(np.prod(out["video_grid_thw"][0])) // 4
    assert ids.count(at_id) == n_img
    assert ids.count(hash_id) == n_vid
    assert "pixel_values" in out and "pixel_values_videos" in out


def test_auto_video_processor_resolution(tmp_path):
    from transformers_tpu.models.auto.video_processing_auto import AutoVideoProcessor
    from transformers_tpu.models.qwen2_vl import Qwen2VLVideoProcessor

    ours = Qwen2VLVideoProcessor(
        size={"shortest_edge": 56 * 56, "longest_edge": 28 * 28 * 128})
    d = str(tmp_path / "vp")
    ours.save_pretrained(d)
    loaded = AutoVideoProcessor.from_pretrained(d)
    assert type(loaded).__name__ == "Qwen2VLVideoProcessor"
    assert loaded.size["shortest_edge"] == 56 * 56


def test_second_per_grid_ts_emitted_and_used():
    """ADVICE r4: the video processor must emit second_per_grid_ts
    (tps/sampled_fps, reference processing_qwen2_5_vl.py:146) and
    get_rope_index must scale Qwen2.5-VL video temporal positions by it."""
    from transformers_tpu.models.qwen2_vl import Qwen2VLVideoProcessor
    from transformers_tpu.models.qwen2_vl.modeling_qwen2_vl import get_rope_index
    from transformers_tpu.video_utils import VideoMetadata

    ours = Qwen2VLVideoProcessor(
        size={"shortest_edge": 56 * 56, "longest_edge": 28 * 28 * 128})
    # explicit fps: tps/fps
    meta = VideoMetadata(total_num_frames=8, fps=4.0)
    out = ours([_video(t=8)], return_tensors="np", fps=2.0,
               video_metadata=[meta])
    spg = np.asarray(out["second_per_grid_ts"])
    assert spg.shape == (1,)
    np.testing.assert_allclose(spg[0], ours.temporal_patch_size / 2.0)
    # no fps info at all -> 1.0
    out2 = ours([_video(t=8)], return_tensors="np")
    np.testing.assert_allclose(np.asarray(out2["second_per_grid_ts"])[0], 1.0)

    # get_rope_index scaling: temporal ids stretch by tokens_per_second * spg
    from transformers_tpu.models.qwen2_5_vl import Qwen2_5_VLConfig

    cfg = Qwen2_5_VLConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2),
        vision_config=dict(depth=1, hidden_size=32, out_hidden_size=32,
                           num_heads=4, patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2, tokens_per_second=2))
    vs, vt = cfg.vision_start_token_id, cfg.video_token_id
    # grid (t=2, h=2, w=2) after merge -> 1x1 spatial, 2 temporal -> 2 tokens
    ids = np.asarray([[5, vs, vt, vt, 6]])
    vgrid = np.asarray([[2, 2, 2]])
    pos1, _ = get_rope_index(cfg, ids, None, vgrid, None,
                             np.asarray([1.0], np.float32))
    pos4, _ = get_rope_index(cfg, ids, None, vgrid, None,
                             np.asarray([4.0], np.float32))
    # temporal axis of the second video token: 1*tps*spg
    t1 = pos1[0, 0, 3] - pos1[0, 0, 2]
    t4 = pos4[0, 0, 3] - pos4[0, 0, 2]
    assert t1 == 2 and t4 == 8, (t1, t4)
