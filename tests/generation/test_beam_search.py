"""Beam search parity vs the torch reference on a tiny random model."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("beam"))
    tm, _ = make_tiny_torch_llama(d, num_hidden_layers=2)
    return d, tm


@pytest.mark.parametrize("num_beams,max_new", [(2, 6), (4, 8)])
def test_beam_search_matches_torch(tiny, num_beams, max_new):
    import torch

    d, tm = tiny
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(torch.tensor(ids), max_new_tokens=max_new, num_beams=num_beams,
                          do_sample=False, pad_token_id=0).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=max_new, num_beams=num_beams,
                                    prompt_pad_multiple=4))
    # trim our padded tail at the reference length; reference pads after eos too
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[0, :n], ref[0, :n])


def test_beam_search_batched(tiny):
    import torch

    d, tm = tiny
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3], [7, 2, 8, 4]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(torch.tensor(ids), max_new_tokens=6, num_beams=3,
                          do_sample=False, pad_token_id=0).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=6, num_beams=3, prompt_pad_multiple=4))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])


def test_num_return_sequences(tiny):
    d, _ = tiny
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=5, num_beams=3, num_return_sequences=2,
                                    prompt_pad_multiple=4))
    assert out.shape[0] == 2
    # the two returned hypotheses must differ or be ranked
    assert out.shape[1] == 4 + 5
