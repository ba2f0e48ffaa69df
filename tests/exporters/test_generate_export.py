"""Decode-loop export: the generate program (bucketed prefill +
while_loop decode, KV cache in-program) serialized via jax.export, reloaded
WITHOUT this package's model classes, generating identically to in-repo
generate() on 3 prompts (VERDICT r3 task 6 done-criterion)."""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _nest(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return out


def test_exported_generate_matches_inrepo(tmp_path):
    d = str(tmp_path / "ckpt")
    make_tiny_torch_llama(d, num_hidden_layers=2)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")

    from transformers_tpu.exporters.stablehlo import save_generate_artifact

    out = str(tmp_path / "artifact")
    save_generate_artifact(model, out, batch_size=1, prompt_bucket=8,
                           max_new=6, eos_token_id=-1, pad_token_id=0)

    # ---- reload side: ONLY jax + safetensors + the manifest
    from jax import export as jax_export
    from safetensors.numpy import load_file

    with open(Path(out) / "generate_export_config.json", encoding="utf-8") as f:
        manifest = json.load(f)
    assert manifest["format"] == "stablehlo-jax-export-generate"
    exported = jax_export.deserialize(
        (Path(out) / "generate.stablehlo").read_bytes())
    params = _nest(load_file(Path(out) / "weights.safetensors"))

    prompts = [[3, 17, 9, 42], [5, 2, 8], [11, 4, 12, 19, 23]]
    bucket = manifest["prompt_bucket"]
    pad = manifest["pad_token_id"]
    for p in prompts:
        ids = np.full((1, bucket), pad, np.int32)
        mask = np.zeros((1, bucket), np.int32)
        ids[0, -len(p):] = p  # left-pad like generate() does
        mask[0, -len(p):] = 1
        got = exported.call(params, jnp.asarray(ids), jnp.asarray(mask),
                            jax.random.key(0),
                            jnp.asarray(manifest["max_new"], jnp.int32))
        ref = model.generate(model.params, input_ids=jnp.asarray([p]),
                             max_new_tokens=manifest["max_new"],
                             prompt_pad_multiple=bucket, eos_token_id=-1,
                             pad_token_id=pad)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_exported_v2_multibucket_sampling_int8(tmp_path):
    """v2 artifact (r4 verdict task 7): multi-bucket program table, sampled
    + greedy programs, int8 weight-only weights — each program generates
    identically to in-repo generate() at matching settings, and the pure-JAX
    consumer example drives the artifact without transformers_tpu."""
    d = str(tmp_path / "ckpt")
    make_tiny_torch_llama(d, num_hidden_layers=2)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")

    from transformers_tpu.exporters.stablehlo import save_generate_artifact

    out = str(tmp_path / "artifact")
    save_generate_artifact(model, out, batch_size=1, prompt_buckets=[8, 16],
                           max_new=5, eos_token_id=-1, pad_token_id=0,
                           samplers=("greedy", "sample"), temperature=0.8,
                           top_k=50, quantize="int8")

    with open(Path(out) / "generate_export_config.json", encoding="utf-8") as f:
        manifest = json.load(f)
    assert len(manifest["programs"]) == 4
    assert manifest["quantize"] == "int8"
    # int8 artifact: the packed q_proj weight is stored int8 with scales
    from safetensors.numpy import load_file

    flat = load_file(Path(out) / "weights.safetensors")
    qkeys = [k for k in flat if k.endswith("q_proj.weight")]
    assert flat[qkeys[0]].dtype == np.int8
    assert any(k.endswith("q_proj.weight_scale") for k in flat)

    # quantized reference model (the same runtime path the program exports)
    from transformers_tpu.quantizers import Int8WeightOnlyConfig, quantize_params

    qparams = quantize_params(model, model.params, Int8WeightOnlyConfig())

    # consumer example drives both samplers x both buckets, parity per call
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "examples"))
    import run_exported_generate as consumer

    prompts = [[3, 17, 9, 42], [5, 2, 8, 7, 1, 6, 11, 2, 9]]  # -> buckets 8, 16
    for p in prompts:
        for sample in (False, True):
            got = consumer.main(out, " ".join(map(str, p)), sample=sample)
            bucket = 8 if len(p) <= 8 else 16
            ref = model.generate(
                qparams, input_ids=jnp.asarray([p]), max_new_tokens=5,
                prompt_pad_multiple=bucket, eos_token_id=-1, pad_token_id=0,
                do_sample=sample, temperature=0.8 if sample else None,
                prng_key=jax.random.key(0))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
