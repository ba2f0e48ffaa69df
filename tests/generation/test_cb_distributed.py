"""TP-sharded continuous batching on an 8-device CPU mesh: sharded pools +
params must produce exactly the unsharded greedy outputs (reference
continuous_batching/distributed.py capability, GSPMD-native here)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_cb_tensor_parallel_matches_single(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import torch
    import transformers

    import transformers_tpu as ttpu
    from transformers_tpu.generation.continuous_batching.distributed import (
        make_tp_engine,
    )
    from transformers_tpu.generation.continuous_batching.scheduler import RequestState
    from transformers_tpu.parallel.mesh import make_mesh

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                                   num_hidden_layers=2, num_attention_heads=8,
                                   num_key_value_heads=8, max_position_embeddings=256)
    tm = transformers.LlamaForCausalLM(cfg).eval()
    d = str(tmp_path / "m")
    tm.save_pretrained(d, safe_serialization=True)

    prompts = [[3, 17, 9, 42, 7, 5], [11, 2, 19, 33]]
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ref = model.generate_batch(prompts, max_new_tokens=10, num_blocks=32,
                               block_size=4, token_budget=8)

    mesh = make_mesh(tensor=8)
    engine = make_tp_engine(model, mesh, num_blocks=32, block_size=4, token_budget=8)
    reqs = [RequestState(request_id=f"r{i}", prompt_ids=p, max_new_tokens=10,
                         eos_token_ids=()) for i, p in enumerate(prompts)]
    for r in reqs:
        engine.add_request(r)
    results = engine.run_to_completion()
    assert results["r0"].generated_ids == ref[0]
    assert results["r1"].generated_ids == ref[1]
    # the pools really are sharded over the tensor axis
    sh = engine.runner.cache.keys[0].sharding
    assert "tensor" in str(sh.spec)
