"""ProphetNet parity vs torch: main+predict stream logits, masks/buckets,
padded batches, greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

CFG = dict(vocab_size=99, hidden_size=32, encoder_ffn_dim=64, num_encoder_layers=2,
           num_encoder_attention_heads=4, decoder_ffn_dim=64, num_decoder_layers=2,
           num_decoder_attention_heads=4, max_position_embeddings=64, ngram=2,
           num_buckets=8, relative_max_distance=16)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("prophetnet"))
    torch.manual_seed(0)
    tm = transformers.ProphetNetForConditionalGeneration(
        transformers.ProphetNetConfig(**CFG)).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


IDS = np.array([[4, 17, 9, 3, 22, 7, 14, 2], [5, 12, 9, 3, 2, 0, 0, 0]])
MASK = (IDS != 0).astype(np.int64)
DEC = np.array([[0, 8, 11, 6, 9], [0, 9, 13, 5, 2]])


def test_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.prophetnet import ProphetNetForConditionalGeneration

    m = ProphetNetForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 decoder_input_ids=torch.from_numpy(DEC))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4
    assert max_abs_diff(out.logits_ngram, ref.logits_ngram.numpy()) < 2e-4


def test_model_streams(ckpt):
    import torch
    import transformers

    d, tm = ckpt
    from transformers_tpu.models.prophetnet import ProphetNetModel

    base = transformers.ProphetNetModel(transformers.ProphetNetConfig(**CFG)).eval()
    base.load_state_dict(tm.prophetnet.state_dict(), strict=False)
    d2 = d + "_base"
    base.save_pretrained(d2, safe_serialization=True)
    m = ProphetNetModel.from_pretrained(d2, dtype="float32")
    with torch.no_grad():
        ref = base(input_ids=torch.from_numpy(IDS),
                   attention_mask=torch.from_numpy(MASK),
                   decoder_input_ids=torch.from_numpy(DEC))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.last_hidden_state, ref.last_hidden_state.numpy()) < 1e-4
    assert max_abs_diff(out.last_hidden_state_ngram,
                        ref.last_hidden_state_ngram.numpy()) < 1e-4


def test_greedy_generate(ckpt):
    import torch

    d, tm = ckpt
    from transformers_tpu.models.prophetnet import ProphetNetForConditionalGeneration

    m = ProphetNetForConditionalGeneration.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.from_numpy(IDS),
                          attention_mask=torch.from_numpy(MASK),
                          max_new_tokens=5, do_sample=False, num_beams=1)
    got = np.asarray(m.generate(m.params, input_ids=IDS, attention_mask=MASK,
                                max_new_tokens=5))
    w = min(got.shape[1], ref.shape[1])
    assert np.array_equal(got[:, :w], ref.numpy()[:, :w]), (got, ref)
