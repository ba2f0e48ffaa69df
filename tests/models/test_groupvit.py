"""GroupViT parity vs torch: token-grouping vision tower + CLIP text."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

PX = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
IDS = np.array([[5, 14, 25, 36, 7, 49407], [5, 9, 11, 49407, 1, 1]], np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], np.int64)


def test_groupvit_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GroupViTConfig(
        text_config=dict(vocab_size=49408, hidden_size=24, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=36,
                         max_position_embeddings=64),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           depths=[1, 1, 1], num_group_tokens=[8, 4, 0],
                           num_output_groups=[8, 4, 4], num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=16, projection_intermediate_dim=40)
    tm = transformers.GroupViTModel(cfg).eval()
    for mod in tm.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.normal_(0, 0.02)
            mod.running_var.uniform_(0.7, 1.3)
    d = str(tmp_path / "groupvit")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 pixel_values=torch.from_numpy(PX))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            pixel_values=jnp.asarray(PX))
    assert np.abs(np.asarray(out.image_embeds) - ref.image_embeds.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.text_embeds) - ref.text_embeds.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.logits_per_image)
                  - ref.logits_per_image.numpy()).max() < 1e-3
