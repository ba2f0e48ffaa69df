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


# ------------------------------------------------- multi-step decode window
def test_cb_multistep_matches_single_step(tiny):
    """steps_per_sync>1 (K decode steps per jitted program) must produce
    byte-identical outputs to the single-step engine AND static generate."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[1, 5, 9, 3], [7, 2, 8], [4, 4, 12, 19, 23, 6]]
    single = model.generate_batch(prompts, max_new_tokens=9, num_blocks=64,
                                  block_size=4, token_budget=4)
    multi = model.generate_batch(prompts, max_new_tokens=9, num_blocks=64,
                                 block_size=4, token_budget=4,
                                 steps_per_sync=4)
    assert multi == single, (multi, single)


def test_cb_multistep_crosses_block_boundary(tiny):
    """K window spanning a paged-block boundary writes the right slots."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[1, 5, 9]]  # block_size 4: decode crosses into block 2 fast
    ref = model.generate_batch(prompts, max_new_tokens=10, num_blocks=64,
                               block_size=4, token_budget=4)
    got = model.generate_batch(prompts, max_new_tokens=10, num_blocks=64,
                               block_size=4, token_budget=4, steps_per_sync=8)
    assert got == ref


def test_cb_multistep_eos_inside_window(tiny):
    """A per-row EOS hit mid-window stops that row; others continue."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[1, 5, 9, 3], [7, 2, 8]]
    base = model.generate_batch(prompts, max_new_tokens=8, num_blocks=64,
                                block_size=4, token_budget=4)
    # pick row 0's 3rd generated token as a fake EOS
    eos = base[0][2]
    engine_kwargs = dict(num_blocks=64, block_size=4, token_budget=4)

    def run(steps):
        engine = ContinuousBatchingEngine(model, steps_per_sync=steps,
                                          **engine_kwargs)
        reqs = []
        for i, p in enumerate(prompts):
            r = RequestState(request_id=f"r{i}", prompt_ids=p,
                             max_new_tokens=8, eos_token_ids=(eos,))
            engine.add_request(r)
            reqs.append(r)
        res = engine.run_to_completion()
        return [res[r.request_id].generated_ids for r in reqs]

    assert run(4) == run(1)


def test_cb_multistep_mixed_budgets(tiny):
    """Rows with different max_new_tokens finish independently in-window."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[1, 5, 9, 3], [7, 2, 8], [4, 4, 12]]
    budgets = [3, 7, 5]

    def run(steps):
        engine = ContinuousBatchingEngine(model, num_blocks=64, block_size=4,
                                          token_budget=4, steps_per_sync=steps)
        reqs = []
        for i, (p, b) in enumerate(zip(prompts, budgets)):
            r = RequestState(request_id=f"r{i}", prompt_ids=p, max_new_tokens=b)
            engine.add_request(r)
            reqs.append(r)
        res = engine.run_to_completion()
        return [res[r.request_id].generated_ids for r in reqs]

    got, ref = run(4), run(1)
    assert got == ref
    assert [len(g) for g in got] == budgets


def test_cb_multistep_temperature_sampling_parity(tiny):
    """Pure-temperature rows sample with counter-based per-request keys
    (fold_in(key(seed), n_committed)) in BOTH the host single-step sampler
    and the decode_multi program, so multi-step output == single-step output
    token for token (ADVICE r4: no engine-global step seed)."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    prompts = [[1, 5, 9, 3], [7, 2, 8]]
    kw = dict(max_new_tokens=6, temperature=0.8, num_blocks=64, block_size=4,
              token_budget=4)
    single = model.generate_batch(prompts, **kw)
    multi = model.generate_batch(prompts, steps_per_sync=4, **kw)
    assert multi == single, (multi, single)
    vocab = model.config.vocab_size
    assert all(len(g) == 6 and all(0 <= t < vocab for t in g) for g in multi)


def test_cb_sampling_per_request_reproducible(tiny):
    """A sampled request's output must not depend on co-scheduled requests:
    running the same (prompt, seed) alone or alongside another request gives
    identical tokens, in both single- and multi-step engines."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")

    def run(prompts, steps):
        engine = ContinuousBatchingEngine(model, num_blocks=64, block_size=4,
                                          token_budget=4, steps_per_sync=steps)
        reqs = []
        for i, p in enumerate(prompts):
            r = RequestState(request_id=f"r{i}", prompt_ids=p,
                             max_new_tokens=6, temperature=0.8, seed=7)
            engine.add_request(r)
            reqs.append(r)
        res = engine.run_to_completion()
        return [res[r.request_id].generated_ids for r in reqs]

    target = [1, 5, 9, 3]
    for steps in (1, 4):
        alone = run([target], steps)[0]
        crowded = run([target, [7, 2, 8]], steps)[0]
        assert alone == crowded, (steps, alone, crowded)


def test_cb_multistep_falls_back_for_topk(tiny):
    """top-k requests route through the host sampler (single-step path)."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    engine = ContinuousBatchingEngine(model, num_blocks=64, block_size=4,
                                      token_budget=4, steps_per_sync=4)
    r = RequestState(request_id="r", prompt_ids=[1, 5, 9], max_new_tokens=4,
                     temperature=0.7, top_k=5)
    engine.add_request(r)
    res = engine.run_to_completion()
    assert len(res["r"].generated_ids) == 4


# ------------------------------------- scheduler behavior (reference suite)
def test_cb_chunked_prefill_with_preemption(tiny):
    """A long prompt prefilling in chunks while pool pressure preempts a
    decode victim: everything still completes with exact outputs."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    long_prompt = list(np.random.default_rng(0).integers(1, 90, size=24))
    short = [[1, 5, 9], [7, 2, 8]]
    prompts = [list(map(int, long_prompt))] + short
    # tiny pool (forces deferred admission + offload preemption path) with
    # swap space enabled
    got = model.generate_batch(prompts, max_new_tokens=5, num_blocks=12,
                               block_size=4, token_budget=8, swap_blocks=8)
    ref = [list(np.asarray(model.generate(
        model.params, input_ids=jnp.asarray([p]), max_new_tokens=5,
        prompt_pad_multiple=1))[0, len(p):]) for p in prompts]
    assert got == ref, (got, ref)


def test_cb_scheduler_fairness_fifo(tiny):
    """FIFO: earlier-submitted requests must finish no later than
    later-submitted ones of the same shape."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    engine = ContinuousBatchingEngine(model, num_blocks=16, block_size=4,
                                      token_budget=4, max_batch=2)
    order = []
    reqs = []
    for i in range(4):
        r = RequestState(request_id=f"r{i}", prompt_ids=[i + 1, i + 2, i + 3],
                         max_new_tokens=3)
        engine.add_request(r)
        reqs.append(r)
    while engine.has_work():
        for ev in engine.step():
            if ev.status == "finished":
                order.append(ev.request_id)
    assert order == [f"r{i}" for i in range(4)], order


def test_cb_decode_bucket_boundaries(tiny):
    """Live batch crossing pow2 bucket boundaries (3->2->1 rows as requests
    finish) replays existing compiled programs without drift."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    engine = ContinuousBatchingEngine(model, num_blocks=64, block_size=4,
                                      token_budget=4)
    budgets = [2, 5, 9]
    reqs = []
    for i, b in enumerate(budgets):
        r = RequestState(request_id=f"r{i}", prompt_ids=[i + 1, i + 5, 9],
                         max_new_tokens=b)
        engine.add_request(r)
        reqs.append(r)
    res = engine.run_to_completion()
    for r, b in zip(reqs, budgets):
        ref = np.asarray(model.generate(
            model.params, input_ids=jnp.asarray([r.prompt_ids]),
            max_new_tokens=b, prompt_pad_multiple=1))[0, len(r.prompt_ids):]
        assert res[r.request_id].generated_ids == list(ref)


def test_cb_failure_propagation(tiny):
    """An engine-step crash must fail every queued request, not hang them
    (reference BackgroundThreadStatus semantics)."""
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    manager = ContinuousBatchingManager(model, num_blocks=64, block_size=4,
                                        token_budget=4)
    # sabotage the runner after startup
    manager.engine.runner.decode_step = None
    manager.engine.runner.prefill_chunk = None
    manager.start()
    try:
        q = manager.submit(RequestState(request_id="x", prompt_ids=[1, 5, 9],
                                        max_new_tokens=4))
        ev = q.get(timeout=60)
        assert ev.status == "failed"
        assert manager._error is not None
    finally:
        manager.stop()
