"""Continuous batching tests (reference tests/generation/
test_continuous_batching.py pattern): block manager, prefix cache,
end-to-end parity vs static generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.generation.continuous_batching import (  # noqa: E402
    BlockManager,
    ContinuousBatchingEngine,
    ContinuousBatchingManager,
    RequestState,
)


# ---------------------------------------------------------------- unit tests
def test_block_manager_alloc_free():
    bm = BlockManager(num_blocks=8, block_size=4)
    assert bm.num_free_blocks == 7  # block 0 reserved
    blocks = bm.allocate(3)
    assert len(blocks) == 3 and 0 not in blocks
    assert bm.allocate(10) is None  # over-subscription defers
    bm.free(blocks)
    assert bm.num_free_blocks == 7


def test_block_manager_prefix_reuse():
    bm = BlockManager(num_blocks=16, block_size=4)
    ids = list(range(10))
    blocks = bm.allocate(3)
    bm.register_full_blocks(ids, blocks)  # 2 full blocks cached (8 tokens)
    shared, matched = bm.match_prefix(ids)
    assert matched == 8 and shared == blocks[:2]
    # refcount: freeing the original must not release shared blocks
    bm.free(blocks)
    assert bm.ref_counts[blocks[0]] == 1
    bm.free(shared)
    assert blocks[0] not in bm.ref_counts


# ------------------------------------------------------------------ e2e
@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cb"))
    make_tiny_torch_llama(d, num_hidden_layers=2)
    return d


def test_cb_matches_static_generate(tiny):
    """CB output == jitted static generate for ragged greedy prompts (the
    reference's e2e parity test, test_continuous_batching.py)."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[1, 5, 9, 3], [7, 2, 8], [4, 4, 12, 19, 23, 6]]
    expected = []
    for p in prompts:
        out = np.asarray(model.generate(model.params, input_ids=jnp.asarray([p]),
                                        max_new_tokens=6, prompt_pad_multiple=1))
        expected.append(list(out[0, len(p):]))
    got = model.generate_batch(prompts, max_new_tokens=6, num_blocks=64, block_size=4,
                               token_budget=4)
    assert got == expected, (got, expected)


def test_cb_prefix_cache_reuse(tiny):
    """Two requests sharing a long prefix: the second must reuse cached
    blocks and still produce identical output."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    shared_prefix = [1, 5, 9, 3, 7, 2, 8, 4]  # 2 full blocks at block_size 4
    p1 = shared_prefix + [11]
    p2 = shared_prefix + [13]
    engine = ContinuousBatchingEngine(model, num_blocks=64, block_size=4, token_budget=4)
    r1 = RequestState(request_id="a", prompt_ids=p1, max_new_tokens=4)
    engine.add_request(r1)
    res1 = engine.run_to_completion()
    r2 = RequestState(request_id="b", prompt_ids=p2, max_new_tokens=4)
    engine.add_request(r2)
    assert engine.bm.match_prefix(shared_prefix)[1] == 8  # cache hit
    engine.bm.free(engine.bm.match_prefix(shared_prefix)[0])  # undo probe refs
    res2 = engine.run_to_completion()
    ref1 = np.asarray(model.generate(model.params, input_ids=jnp.asarray([p1]),
                                     max_new_tokens=4, prompt_pad_multiple=1))[0, len(p1):]
    ref2 = np.asarray(model.generate(model.params, input_ids=jnp.asarray([p2]),
                                     max_new_tokens=4, prompt_pad_multiple=1))[0, len(p2):]
    assert res1["a"].generated_ids == list(ref1)
    assert res2["b"].generated_ids == list(ref2)


def test_cb_manager_threaded(tiny):
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    manager = ContinuousBatchingManager(model, num_blocks=64, block_size=4, token_budget=4)
    manager.start()
    try:
        q1 = manager.submit(RequestState(request_id="x", prompt_ids=[1, 5, 9, 3], max_new_tokens=4))
        q2 = manager.submit(RequestState(request_id="y", prompt_ids=[7, 2, 8], max_new_tokens=4))
        outs = {}
        for q in (q1, q2):
            while True:
                ev = q.get(timeout=60)
                if ev.status in ("finished", "failed"):
                    outs[ev.request_id] = ev
                    break
        assert outs["x"].status == "finished" and len(outs["x"].generated_ids) == 4
        assert outs["y"].status == "finished" and len(outs["y"].generated_ids) == 4
    finally:
        manager.stop()


def test_cb_oversubscription_defers(tiny):
    """More requests than the pool can hold at once: all still complete."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[i + 1, i + 2, i + 3] for i in range(6)]
    got = model.generate_batch(prompts, max_new_tokens=4, num_blocks=8, block_size=4,
                               token_budget=4)
    assert all(len(g) == 4 for g in got)
