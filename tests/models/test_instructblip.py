"""InstructBLIP parity: Q-Former reads the instruction text alongside queries."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=4, image_size=16, patch_size=8),
    qformer_config=dict(vocab_size=60, hidden_size=24, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=48,
                        cross_attention_frequency=2, max_position_embeddings=32),
    text_config=dict(model_type="opt", vocab_size=99, hidden_size=32, num_hidden_layers=2,
                     ffn_dim=64, num_attention_heads=4, max_position_embeddings=128,
                     word_embed_proj_dim=32),
    num_query_tokens=4,
    image_token_index=98,
)


def test_forward_logit_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.InstructBlipConfig(**TINY)
    tm = transformers.InstructBlipForConditionalGeneration(config).eval()
    d = str(tmp_path / "instructblip")
    tm.save_pretrained(d, safe_serialization=True)

    model = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ids = np.array([[98, 98, 98, 98, 5, 9, 3, 7]], dtype=np.int64)
    q_ids = np.array([[2, 7, 9, 4, 1]], dtype=np.int64)
    q_mask = np.array([[1, 1, 1, 1, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 qformer_input_ids=torch.tensor(q_ids),
                 qformer_attention_mask=torch.tensor(q_mask)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(ids),
                pixel_values=jnp.asarray(pixels),
                qformer_input_ids=jnp.asarray(q_ids),
                qformer_attention_mask=jnp.asarray(q_mask))
    assert max_abs_diff(out.logits, ref) < 5e-5
