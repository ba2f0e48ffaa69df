"""Weight-only quantization tests."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama, max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu import Int4WeightOnlyConfig, Int8WeightOnlyConfig  # noqa: E402


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("quant"))
    make_tiny_torch_llama(d, num_hidden_layers=2)
    return d


def test_int8_weight_only(tiny):
    fp = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    q = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32",
                                                  quantization_config=Int8WeightOnlyConfig())
    # quantized leaves are int8 with scales
    w = q.params["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]
    assert w.dtype == jnp.int8
    assert "weight_scale" in q.params["model"]["layers"]["0"]["self_attn"]["q_proj"]
    # embeddings untouched
    assert q.params["model"]["embed_tokens"]["weight"].dtype == jnp.float32

    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    ref = fp(fp.params, input_ids=jnp.asarray(ids)).logits
    out = q(q.params, input_ids=jnp.asarray(ids)).logits
    # int8 weight-only keeps logits close (tiny random models have
    # near-uniform logits, so exact argmax equality is not meaningful)
    assert max_abs_diff(out, ref) < 0.15


def test_int8_generate_works(tiny):
    q = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32",
                                                  quantization_config=Int8WeightOnlyConfig())
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    out = np.asarray(q.generate(q.params, input_ids=jnp.asarray(ids), max_new_tokens=5,
                                prompt_pad_multiple=4))
    assert out.shape == (1, 9)


def test_int4_roundtrip_and_forward(tiny):
    from transformers_tpu.quantizers.weight_only import (
        Int4WeightOnlyQuantizer, unpack_int4,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    qz = Int4WeightOnlyQuantizer(Int4WeightOnlyConfig())
    packed, scale = qz.quantize_tensor("x.weight", w)
    assert packed.shape == (16, 16) and packed.dtype == jnp.int8
    recon = unpack_int4(packed, scale, jnp.float32)
    # max quantization error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(recon - w) / scale[None, :])) <= 0.51

    q = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32",
                                                  quantization_config=Int4WeightOnlyConfig())
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    out = q(q.params, input_ids=jnp.asarray(ids))
    assert np.isfinite(np.asarray(out.logits)).all()


def test_fp8_weight_only(tiny):
    from transformers_tpu import Fp8WeightOnlyConfig

    fp = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    q = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32",
                                                  quantization_config=Fp8WeightOnlyConfig())
    w = q.params["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]
    assert w.dtype == jnp.float8_e4m3fn
    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    ref = fp(fp.params, input_ids=jnp.asarray(ids)).logits
    out = q(q.params, input_ids=jnp.asarray(ids)).logits
    assert max_abs_diff(out, ref) < 0.1


def test_quantized_kv_cache(tiny):
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    params = model.params
    ids = np.array([[1, 5, 9, 3, 22, 7, 14, 2]], dtype=np.int32)
    full = model(params, input_ids=jnp.asarray(ids))
    cache = model.init_cache(1, 8, dtype=jnp.float32, implementation="quantized")
    assert cache.keys[0].dtype == jnp.int8
    mask = np.zeros((1, 8), np.int32)
    mask[:, :4] = 1
    out = model(params, input_ids=jnp.asarray(ids[:, :4]), attention_mask=jnp.asarray(mask),
                past_key_values=cache, cache_position=0)
    cache = out.past_key_values
    for t in range(4, 8):
        mask[:, t] = 1
        step = model(params, input_ids=jnp.asarray(ids[:, t:t+1]),
                     attention_mask=jnp.asarray(mask), position_ids=jnp.asarray([[t]]),
                     past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        diff = max_abs_diff(step.logits[:, 0], full.logits[:, t])
        assert diff < 0.05, (t, diff)  # int8 KV error stays small


def test_generate_with_quantized_cache(tiny):
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=5, prompt_pad_multiple=4,
                                    cache_implementation="quantized"))
    assert out.shape == (1, 9)


def test_quantized_dot_matches_dequant_reference():
    """(x @ codes) * scale must equal x @ dequant(codes) — the identity the
    runtime compute path relies on (core/module.py Linear.__call__)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformers_tpu.quantizers.weight_only import (
        dequantize_int8,
        quantized_dot,
        unpack_int4,
        unpack_int4_codes,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    q = jnp.asarray(rng.integers(-127, 128, size=(16, 24)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(24,)), jnp.float32)

    ref = x @ dequantize_int8(q, scale, jnp.float32)
    out = quantized_dot(x, q, scale, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    packed = jnp.asarray(rng.integers(-128, 128, size=(8, 24)), jnp.int8)
    ref4 = x @ unpack_int4(packed, scale, jnp.float32)
    out4 = quantized_dot(x, unpack_int4_codes(packed), scale, jnp.float32)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4), rtol=1e-5, atol=1e-5)

    # the int8 operand must reach dot_general unconverted (no bf16
    # materialization of the weight): check the jaxpr has no convert of the
    # weight before the dot
    jaxpr = jax.make_jaxpr(lambda a, b, s: quantized_dot(a, b, s, jnp.float32))(x, q, scale)
    dot_eqns = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dot_eqns, "quantized_dot must lower to dot_general"
    assert str(dot_eqns[0].invars[1].aval.dtype) == "int8", \
        "weight operand must stay int8 into the dot"
