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


def test_public_api_assistant_model(models):
    """generate(assistant_model=) routes through speculative decoding and
    reproduces greedy (reference generate mode 'assisted_generation')."""
    target, draft = models
    ids = np.array([[1, 5, 9, 3]], dtype=np.int32)
    greedy = np.asarray(target.generate(target.params, input_ids=jnp.asarray(ids),
                                        max_new_tokens=16, prompt_pad_multiple=4,
                                        eos_token_id=-1))
    assisted = np.asarray(target.generate(
        target.params, input_ids=jnp.asarray(ids), max_new_tokens=16,
        assistant_model=draft, assistant_params=draft.params, eos_token_id=-1))
    np.testing.assert_array_equal(assisted[0], greedy[0, : assisted.shape[1]])


def test_prompt_lookup_matches_greedy(models):
    """Prompt-lookup candidates (reference PromptLookupCandidateGenerator)
    keep greedy equivalence on a repetitive prompt."""
    target, _ = models
    ids = np.array([[4, 7, 9, 4, 7, 9, 4, 7]], dtype=np.int32)
    greedy = np.asarray(target.generate(target.params, input_ids=jnp.asarray(ids),
                                        max_new_tokens=12, prompt_pad_multiple=8,
                                        eos_token_id=-1))
    looked = np.asarray(target.generate(
        target.params, input_ids=jnp.asarray(ids), max_new_tokens=12,
        prompt_lookup_num_tokens=5, eos_token_id=-1))
    np.testing.assert_array_equal(looked[0], greedy[0, : looked.shape[1]])


def test_speculative_sampling_distribution(models):
    """The speculative-sampling rule leaves the target's sampling
    distribution unchanged (reference _speculative_sampling, utils.py:3981):
    empirical first-token frequencies from assisted sampling match direct
    sampling from the target softmax within statistical tolerance."""
    import torch
    import transformers

    target, draft = models
    ids = np.array([[1, 5, 9, 3]], dtype=np.int32)

    # exact target distribution for the first generated token
    out = target(target.params, input_ids=jnp.asarray(ids))
    logits = np.asarray(out.logits, np.float32)[0, -1]
    temperature = 1.3
    z = (logits / temperature) - (logits / temperature).max()
    p_exact = np.exp(z) / np.exp(z).sum()

    n_draws = 600
    counts = np.zeros_like(p_exact)
    for trial in range(n_draws):
        seq = np.asarray(target.generate(
            target.params, input_ids=jnp.asarray(ids), max_new_tokens=1,
            assistant_model=draft, assistant_params=draft.params,
            do_sample=True, temperature=temperature, eos_token_id=-1,
            prng_key=__import__("jax").random.key(trial)))
        counts[int(seq[0, -1])] += 1
    emp = counts / n_draws
    tv = 0.5 * np.abs(emp - p_exact).sum()
    # total-variation distance of a 600-sample empirical distribution
    assert tv < 0.15, f"TV distance {tv:.3f} — speculative sampling is biased"
