"""Video-LLaVA + InstructBLIP-Video parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_video_llava_parity(tmp_path):
    from transformers_tpu.models.video_llava import VideoLlavaForConditionalGeneration

    torch.manual_seed(0)
    cfg = transformers.VideoLlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=16, patch_size=8),
        text_config=dict(model_type="llama", vocab_size=99, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2),
        image_token_index=97, video_token_index=98)
    tm = transformers.VideoLlavaForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "vllava")
    tm.save_pretrained(d, safe_serialization=True)

    m = VideoLlavaForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # image 16/8 -> 2x2=4 patches (CLS dropped); video keeps CLS: 2x5=10
    img = np.random.default_rng(0).random((1, 3, 16, 16)).astype(np.float32)
    vid = np.random.default_rng(1).random((1, 2, 3, 16, 16)).astype(np.float32)
    ids = np.array([[1] + [97] * 4 + [5] + [98] * 10 + [7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values_images=torch.from_numpy(img),
                 pixel_values_videos=torch.from_numpy(vid)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values_images=jnp.asarray(img),
            pixel_values_videos=jnp.asarray(vid))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_instructblipvideo_parity(tmp_path):
    from transformers_tpu.models.instructblipvideo import (
        InstructBlipVideoForConditionalGeneration,
    )

    torch.manual_seed(0)
    cfg = transformers.InstructBlipVideoConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=16, patch_size=8),
        qformer_config=dict(vocab_size=99, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=64, encoder_hidden_size=32,
                            cross_attention_frequency=1),
        text_config=dict(model_type="opt", vocab_size=99, hidden_size=32,
                         ffn_dim=64, num_hidden_layers=2,
                         num_attention_heads=4, word_embed_proj_dim=32),
        num_query_tokens=3, video_token_index=96)
    tm = transformers.InstructBlipVideoForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "ibv")
    tm.save_pretrained(d, safe_serialization=True)

    m = InstructBlipVideoForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    vid = np.random.default_rng(2).random((1, 4, 3, 16, 16)).astype(np.float32)
    # 4 frames x 3 query tokens = 12 video slots
    ids = np.array([[2] + [96] * 12 + [5, 9]], dtype=np.int64)
    qids = np.array([[4, 8, 15]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 qformer_input_ids=torch.from_numpy(qids),
                 pixel_values=torch.from_numpy(vid)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            qformer_input_ids=jnp.asarray(qids),
            pixel_values=jnp.asarray(vid))
    assert max_abs_diff(out.logits, ref) < 5e-5
