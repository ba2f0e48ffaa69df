"""DeepseekVL parity vs the reference source tree (subprocess oracle)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402
from ref_oracle import reference_run  # noqa: E402

TEXT = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128)
VISION = dict(hidden_size=24, intermediate_size=48, num_hidden_layers=2,
              num_attention_heads=4, image_size=32, patch_size=16,
              num_channels=3)

rng = np.random.default_rng(0)
PIXELS = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
# 4 image patches -> 4 image tokens (id 9)
IDS = np.array([[1, 5, 9, 9, 9, 9, 7, 2]])


def test_forward_parity(tmp_path):
    d = str(tmp_path / "dsvl")
    np.save(tmp_path / "px.npy", PIXELS)
    out = reference_run(f"""
from transformers import DeepseekVLConfig, DeepseekVLForConditionalGeneration
import numpy as np
cfg = DeepseekVLConfig(text_config={TEXT!r}, vision_config={VISION!r},
                       image_token_id=9)
m = DeepseekVLForConditionalGeneration(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
px = torch.tensor(np.load({str(tmp_path / 'px.npy')!r}))
ids = torch.tensor({IDS.tolist()!r})
with torch.no_grad():
    logits = m(input_ids=ids, pixel_values=px).logits
    text_only = m(input_ids=torch.tensor([[1, 5, 7, 2]])).logits
outputs = {{"logits": logits, "text_only": text_only}}
""")
    from transformers_tpu.models.deepseek_vl import DeepseekVLForConditionalGeneration

    m = DeepseekVLForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    got = m(m.params, input_ids=jnp.asarray(IDS), pixel_values=jnp.asarray(PIXELS))
    assert max_abs_diff(got.logits, out["logits"]) < 5e-5
    got_t = m(m.params, input_ids=jnp.asarray([[1, 5, 7, 2]]))
    assert max_abs_diff(got_t.logits, out["text_only"]) < 5e-5
