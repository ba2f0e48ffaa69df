"""X-CLIP parity vs torch: cross-frame message tokens + MIT + prompt generator."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

VIDEO = np.random.default_rng(0).normal(size=(2, 4, 3, 32, 32)).astype(np.float32)
IDS = np.array([[5, 14, 25, 36, 7, 49407], [5, 9, 11, 49407, 1, 1]], np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], np.int64)


def test_xclip_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.XCLIPConfig(
        text_config=dict(vocab_size=49408, hidden_size=24, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=36,
                         max_position_embeddings=64),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           mit_hidden_size=16, mit_intermediate_size=24,
                           mit_num_hidden_layers=1, mit_num_attention_heads=4,
                           image_size=32, patch_size=8, num_frames=4),
        projection_dim=16, prompt_layers=1, prompt_num_attention_heads=4)
    tm = transformers.XCLIPModel(cfg).eval()
    d = str(tmp_path / "xclip")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 pixel_values=torch.from_numpy(VIDEO))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            pixel_values=jnp.asarray(VIDEO))
    assert np.abs(np.asarray(out.video_embeds) - ref.video_embeds.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.text_embeds) - ref.text_embeds.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.logits_per_video)
                  - ref.logits_per_video.numpy()).max() < 1e-3
