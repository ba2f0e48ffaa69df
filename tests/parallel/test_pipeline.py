"""GPipe pipeline parallelism (parallel/pipeline.py): exactness vs sequential
execution, gradients through the schedule, and a llama-decoder integration.
Runs on the 8-virtual-CPU-device mesh from conftest."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.parallel.mesh import make_mesh  # noqa: E402
from transformers_tpu.parallel.pipeline import (  # noqa: E402
    pipeline_forward,
    shard_stacked_params,
    stack_layer_params,
)

L, D, MB, M = 8, 16, 4, 4  # layers, width, microbatch, n_microbatches


def toy_params(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), L)
    return [{"w": jax.random.normal(k, (D, D)) * 0.3, "b": jnp.zeros((D,))} for k in ks]


def toy_layer(lp, x):
    return jnp.tanh(x @ lp["w"] + lp["b"])


def sequential(layers, x):
    for lp in layers:
        x = toy_layer(lp, x)
    return x


def test_pipeline_matches_sequential():
    mesh = make_mesh(pipeline=4, data=2)
    layers = toy_params()
    stacked = shard_stacked_params(stack_layer_params(layers), mesh)
    micro = jax.random.normal(jax.random.PRNGKey(1), (M, MB, D))
    out = jax.jit(lambda p, m: pipeline_forward(toy_layer, p, m, mesh))(stacked, micro)
    ref = jnp.stack([sequential(layers, micro[i]) for i in range(M)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_grad_matches_sequential():
    mesh = make_mesh(pipeline=4, data=2)
    layers = toy_params()
    stacked = stack_layer_params(layers)
    micro = jax.random.normal(jax.random.PRNGKey(2), (M, MB, D))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (M, MB, D))

    def pipe_loss(p):
        out = pipeline_forward(toy_layer, p, micro, mesh)
        return jnp.mean((out - tgt) ** 2)

    def seq_loss(p):
        def apply(x):
            def one(h, lp):
                return toy_layer(lp, h), None
            return jax.lax.scan(one, x, p)[0]
        out = jax.vmap(apply)(micro)
        return jnp.mean((out - tgt) ** 2)

    g_pipe = jax.jit(jax.grad(pipe_loss))(shard_stacked_params(stacked, mesh))
    g_seq = jax.jit(jax.grad(seq_loss))(stacked)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipeline_llama_decoder_layers():
    """Pipeline the llama decoder stack (homogeneous layers) and compare to
    the unpipelined model block-by-block output."""
    config = ttpu.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=8, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=64)
    model = ttpu.LlamaForCausalLM(config, dtype=jnp.float32)
    params = model.init_params(0)
    mesh = make_mesh(pipeline=4, data=2)

    seq = 8
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 64, size=(M * 2, seq)))
    inner = model.model
    hidden = inner.embed_tokens(params["model"]["embed_tokens"], ids)
    positions = jnp.broadcast_to(jnp.arange(seq)[None, :], (M * 2, seq))
    cos, sin = inner.compute_rope(positions)
    attn_args = {"q_positions": positions, "kv_valid": jnp.ones((M * 2, seq), jnp.int32),
                 "is_causal": True, "sliding_window": None}

    layer_mod = inner.layers[0]  # homogeneous: same module structure per layer

    def layer_fn(lp, h):
        out, _ = layer_mod(lp, h, cos, sin, attn_args, None, 0)
        return out

    layer_params = [params["model"]["layers"][str(i)] for i in range(8)]
    stacked = shard_stacked_params(stack_layer_params(layer_params), mesh)

    # microbatch dim: hidden [2M, s, d] -> [M, 2, s, d]; closed-over cos/sin/
    # attn_args index the FULL batch, so instead feed full-batch "microbatches"
    # of the whole hidden tensor? No — keep it simple: one microbatch = the
    # full batch, M=1 checks schedule-degenerate; then 4 microbatches with
    # per-microbatch broadcastable extras require mb == full batch here, so
    # use batch-identical extras by repeating ids per microbatch.
    ref = hidden
    for i in range(8):
        ref, _ = layer_mod(layer_params[i], ref, cos, sin, attn_args, None, 0)

    micro = jnp.broadcast_to(hidden[None], (1, *hidden.shape))
    out = jax.jit(lambda p, m: pipeline_forward(layer_fn, p, m, mesh))(stacked, micro)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=2e-5)


def test_pipeline_true_microbatching_llama():
    """Real microbatching: rope/mask extras built per-microbatch inside
    layer_fn (position extras identical across microbatches here)."""
    config = ttpu.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=4, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=64)
    model = ttpu.LlamaForCausalLM(config, dtype=jnp.float32)
    params = model.init_params(0)
    mesh = make_mesh(pipeline=4, data=2)

    seq, mb = 8, 2
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 64, size=(M * mb, seq)))
    inner = model.model
    hidden = inner.embed_tokens(params["model"]["embed_tokens"], ids)

    positions = jnp.broadcast_to(jnp.arange(seq)[None, :], (mb, seq))
    cos, sin = inner.compute_rope(positions)
    attn_args = {"q_positions": positions, "kv_valid": jnp.ones((mb, seq), jnp.int32),
                 "is_causal": True, "sliding_window": None}
    layer_mod = inner.layers[0]

    def layer_fn(lp, h):
        out, _ = layer_mod(lp, h, cos, sin, attn_args, None, 0)
        return out

    layer_params = [params["model"]["layers"][str(i)] for i in range(4)]
    stacked = shard_stacked_params(stack_layer_params(layer_params), mesh)
    micro = hidden.reshape(M, mb, seq, -1)
    out = jax.jit(lambda p, m: pipeline_forward(layer_fn, p, m, mesh))(stacked, micro)

    full_pos = jnp.broadcast_to(jnp.arange(seq)[None, :], (M * mb, seq))
    fcos, fsin = inner.compute_rope(full_pos)
    fargs = {"q_positions": full_pos, "kv_valid": jnp.ones((M * mb, seq), jnp.int32),
             "is_causal": True, "sliding_window": None}
    ref = hidden
    for i in range(4):
        ref, _ = layer_mod(layer_params[i], ref, fcos, fsin, fargs, None, 0)
    np.testing.assert_allclose(np.asarray(out.reshape(M * mb, seq, -1)),
                               np.asarray(ref), atol=2e-5)
