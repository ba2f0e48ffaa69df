"""LLaVA-NeXT-Video parity vs torch: AnyRes images + pooled video frames."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IMG_TOKEN = 90
VID_TOKEN = 91
N_IMG_TOKENS = 24
# vision 8/4 -> 2x2 patches per frame, pool stride 2 -> 1 token/frame; 3 frames
N_VID_TOKENS = 3


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.LlavaNextVideoConfig(
        vision_config=dict(model_type="clip_vision_model", hidden_size=24,
                           intermediate_size=48, num_hidden_layers=2,
                           num_attention_heads=2, image_size=8, patch_size=4),
        text_config=dict(model_type="llama", vocab_size=99, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2),
        image_grid_pinpoints=[[16, 16]], image_token_index=IMG_TOKEN,
        video_token_index=VID_TOKEN, spatial_pool_mode="average",
        spatial_pool_stride=2, attn_implementation="eager")
    config.vision_config._attn_implementation = "eager"
    config.text_config._attn_implementation = "eager"
    tm = transformers.LlavaNextVideoForConditionalGeneration(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "lnv")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    rng = np.random.RandomState(0)
    px = rng.randn(1, 5, 3, 8, 8).astype(np.float32)
    pxv = rng.randn(1, N_VID_TOKENS, 3, 8, 8).astype(np.float32)
    sizes = np.array([[16, 16]], dtype=np.int64)
    ids = np.concatenate(
        [np.full((1, N_IMG_TOKENS), IMG_TOKEN, dtype=np.int64),
         np.full((1, N_VID_TOKENS), VID_TOKEN, dtype=np.int64),
         np.array([[5, 9, 11, 3]], dtype=np.int64)], axis=1)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 pixel_values_videos=torch.tensor(pxv),
                 image_sizes=torch.tensor(sizes),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(px),
                pixel_values_videos=jnp.asarray(pxv), image_sizes=sizes,
                attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5
