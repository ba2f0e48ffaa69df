"""KOSMOS-2 parity vs torch: CLIP tower → latent-query resampler → image
embeddings scattered into the fairseq-style text decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

LATENT = 4


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.Kosmos2Config(
        text_config=dict(vocab_size=99, embed_dim=32, layers=2, ffn_dim=64,
                         attention_heads=4, max_position_embeddings=64),
        vision_config=dict(hidden_size=24, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=8),
        latent_query_num=LATENT, attn_implementation="eager")
    # torch doesn't propagate attn_implementation into composite sub-configs;
    # left on sdpa, the resampler picks up a top-left-causal quirk
    config.text_config._attn_implementation = "eager"
    config.vision_config._attn_implementation = "eager"
    tm = transformers.Kosmos2ForConditionalGeneration(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def make_inputs():
    rng = np.random.RandomState(0)
    px = rng.randn(2, 3, 16, 16).astype(np.float32)
    ids = np.zeros((2, LATENT + 4), dtype=np.int64)
    ids[:, :LATENT] = 90   # image placeholders
    ids[0, LATENT:] = [5, 9, 11, 3]
    ids[1, LATENT:] = [7, 3, 2, 8]
    mask = np.ones_like(ids)
    img_pos = np.zeros_like(ids)
    img_pos[:, :LATENT] = 1
    return px, ids, mask, img_pos


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "k2")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    px, ids, mask, img_pos = make_inputs()
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(px), input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 image_embeds_position_mask=torch.tensor(img_pos)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(px), attention_mask=jnp.asarray(mask),
                image_embeds_position_mask=jnp.asarray(img_pos))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "k2-gen")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    px, ids, mask, img_pos = make_inputs()
    with torch.no_grad():
        ref = tm.generate(pixel_values=torch.tensor(px),
                          input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask),
                          image_embeds_position_mask=torch.tensor(img_pos),
                          max_new_tokens=6, do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    pixel_values=jnp.asarray(px),
                                    attention_mask=jnp.asarray(mask),
                                    image_embeds_position_mask=jnp.asarray(img_pos),
                                    max_new_tokens=6,
                                    prompt_pad_multiple=ids.shape[1]))
    np.testing.assert_array_equal(out[:, :ref.shape[1]], ref)
