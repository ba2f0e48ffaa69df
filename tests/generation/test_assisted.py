"""Assisted (speculative) decoding: greedy equivalence guarantee."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.generation.candidate_generator import assisted_generate  # noqa: E402


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("target"))
    make_tiny_torch_llama(d1, num_hidden_layers=3, seed=0)
    d2 = str(tmp_path_factory.mktemp("draft"))
    make_tiny_torch_llama(d2, num_hidden_layers=1, hidden_size=32, seed=1)
    target = ttpu.AutoModelForCausalLM.from_pretrained(d1, dtype="float32")
    draft = ttpu.AutoModelForCausalLM.from_pretrained(d2, dtype="float32")
    return target, draft


@pytest.mark.parametrize("gamma", [2, 5])
def test_assisted_matches_greedy(models, gamma):
    target, draft = models
    ids = np.array([[1, 5, 9, 3]], dtype=np.int32)
    greedy = np.asarray(target.generate(target.params, input_ids=jnp.asarray(ids),
                                        max_new_tokens=16, prompt_pad_multiple=4,
                                        eos_token_id=-1))
    assisted = assisted_generate(target, draft, ids, max_new_tokens=16,
                                 num_assistant_tokens=gamma, eos_token_id=-1, max_len=64)
    np.testing.assert_array_equal(assisted[0], greedy[0, : assisted.shape[1]])


def test_assisted_with_same_model_accepts_everything(models):
    """Draft == target: every proposal accepted; output still equals greedy."""
    target, _ = models
    ids = np.array([[7, 2, 8, 4]], dtype=np.int32)
    greedy = np.asarray(target.generate(target.params, input_ids=jnp.asarray(ids),
                                        max_new_tokens=12, prompt_pad_multiple=4,
                                        eos_token_id=-1))
    assisted = assisted_generate(target, target, ids, max_new_tokens=12,
                                 num_assistant_tokens=4, eos_token_id=-1, max_len=64)
    np.testing.assert_array_equal(assisted[0], greedy[0, : assisted.shape[1]])
