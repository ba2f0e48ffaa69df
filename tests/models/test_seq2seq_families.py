"""Seq2seq family parity suite (mBART / Pegasus / Marian / M2M100) vs torch.

Same pattern as test_decoder_families: tiny random reference checkpoints,
forward logit parity with padded batches, greedy generate parity.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64)

FAMILIES = {
    "mbart": ("MBartConfig", dict()),
    "mbart-scaled": ("MBartConfig", dict(scale_embedding=True)),
    "pegasus": ("PegasusConfig", dict(scale_embedding=True, activation_function="relu",
                                      pad_token_id=0, eos_token_id=1,
                                      decoder_start_token_id=0, forced_eos_token_id=1)),
    "marian": ("MarianConfig", dict(scale_embedding=True, activation_function="swish",
                                    pad_token_id=58, eos_token_id=0, bos_token_id=None,
                                    decoder_start_token_id=58, forced_eos_token_id=0)),
    "m2m_100": ("M2M100Config", dict(scale_embedding=True, activation_function="relu",
                                     pad_token_id=1, eos_token_id=2, bos_token_id=0,
                                     decoder_start_token_id=2)),
    "plbart": ("PLBartConfig", dict(scale_embedding=True, activation_function="gelu")),
    "blenderbot": ("BlenderbotConfig", dict(activation_function="gelu",
                                            pad_token_id=0, bos_token_id=1,
                                            eos_token_id=2, decoder_start_token_id=1)),
    "blenderbot_small": ("BlenderbotSmallConfig", dict(activation_function="gelu",
                                                       pad_token_id=0, bos_token_id=1,
                                                       eos_token_id=2,
                                                       decoder_start_token_id=1)),
}

IDS = np.array([[0, 5, 9, 3, 2], [0, 8, 15, 2, 1]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 1, 0]], dtype=np.int64)
DEC = np.array([[2, 0, 11], [2, 0, 7]], dtype=np.int64)


def make_tiny(tmp_dir, name, cfg):
    import torch
    import transformers

    torch.manual_seed(0)
    config = getattr(transformers, name)(**{**TINY, **cfg}, attn_implementation="eager")
    arch = transformers.AutoModelForSeq2SeqLM._model_mapping[type(config)]
    tm = arch(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_forward_logit_parity(family, tmp_path):
    import torch

    name, cfg = FAMILIES[family]
    d = str(tmp_path / family)
    tm = make_tiny(d, name, cfg)
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
                decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5, family


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_greedy_generate_matches_torch(family, tmp_path):
    import torch

    name, cfg = FAMILIES[family]
    d = str(tmp_path / family)
    tm = make_tiny(d, name, cfg)
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                          max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    kwargs = {}
    forced_bos = tm.generation_config.forced_bos_token_id
    if forced_bos is not None:
        kwargs["forced_bos_token_id"] = forced_bos
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK), max_new_tokens=6,
                                    **kwargs))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])
