"""LLaVA-NeXT parity vs torch: AnyRes tile packing (grid reassembly +
unpad + image_newline) into the Llama decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IMG_TOKEN = 90
# vision image_size=8, patch=4 → hw=2; pinpoints [[16,16]] → 2x2 tiles + base
# tokens per image: base 4 + 4*(4+1 newline col) = 24
N_IMG_TOKENS = 24


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.LlavaNextConfig(
        vision_config=dict(model_type="clip_vision_model", hidden_size=24,
                           intermediate_size=48, num_hidden_layers=2,
                           num_attention_heads=2, image_size=8, patch_size=4),
        text_config=dict(model_type="llama", vocab_size=99, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2),
        image_grid_pinpoints=[[16, 16]], image_token_index=IMG_TOKEN,
        attn_implementation="eager")
    config.vision_config._attn_implementation = "eager"
    config.text_config._attn_implementation = "eager"
    tm = transformers.LlavaNextForConditionalGeneration(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def make_inputs():
    rng = np.random.RandomState(0)
    px = rng.randn(2, 5, 3, 8, 8).astype(np.float32)
    sizes = np.array([[16, 16], [16, 16]], dtype=np.int64)
    text = np.array([[5, 9, 11, 3], [7, 3, 2, 8]], dtype=np.int64)
    ids = np.concatenate(
        [np.full((2, N_IMG_TOKENS), IMG_TOKEN, dtype=np.int64), text], axis=1)
    mask = np.ones_like(ids)
    return px, sizes, ids, mask


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "lnx")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    px, sizes, ids, mask = make_inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                 image_sizes=torch.tensor(sizes),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(px), image_sizes=sizes,
                attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "lnx-gen")
    tm = make_tiny(d)
    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    px, sizes, ids, mask = make_inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids),
                          pixel_values=torch.tensor(px),
                          image_sizes=torch.tensor(sizes),
                          attention_mask=torch.tensor(mask), max_new_tokens=6,
                          do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    pixel_values=jnp.asarray(px),
                                    image_sizes=sizes,
                                    attention_mask=jnp.asarray(mask),
                                    max_new_tokens=6,
                                    prompt_pad_multiple=ids.shape[1]))
    np.testing.assert_array_equal(out[:, :ref.shape[1]], ref)
