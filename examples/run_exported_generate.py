"""Serve an exported generate artifact WITHOUT transformers_tpu.

Pure-JAX consumer (r4 verdict task 7): deserializes a program from the
artifact's manifest, rebuilds the params pytree from the flat dot-keyed
safetensors, and generates. Usage:

    python examples/run_exported_generate.py <artifact_dir> "12 7 99" [--sample]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export
from safetensors.numpy import load_file


def load_params(path):
    tree = {}
    for key, arr in load_file(path).items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def main(artifact_dir, prompt, sample=False, max_new=None, seed=0):
    manifest = json.load(open(os.path.join(artifact_dir,
                                           "generate_export_config.json")))
    want = "sample" if sample else "greedy"
    ids = np.asarray([int(t) for t in prompt.split()], np.int32)
    # pick the smallest exported bucket the prompt fits
    fits = sorted((p["prompt_bucket"], name)
                  for name, p in manifest["programs"].items()
                  if p["sampler"] == want and p["prompt_bucket"] >= ids.size)
    if not fits:
        raise SystemExit(f"no exported {want} bucket >= {ids.size} tokens")
    bucket, name = fits[0]
    program = jax_export.deserialize(
        open(os.path.join(artifact_dir, name), "rb").read())
    params = load_params(os.path.join(artifact_dir, "weights.safetensors"))

    pad = manifest["pad_token_id"]
    prompt_ids = np.full((manifest["batch_size"], bucket), pad, np.int32)
    mask = np.zeros_like(prompt_ids)
    prompt_ids[0, bucket - ids.size:] = ids  # left pad
    mask[0, bucket - ids.size:] = 1
    out = program.call(params, jnp.asarray(prompt_ids), jnp.asarray(mask),
                       jax.random.key(seed),
                       jnp.asarray(max_new or manifest["max_new"], jnp.int32))
    print(np.asarray(out)[0].tolist())
    return np.asarray(out)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0], args[1], sample="--sample" in sys.argv,
         max_new=int(args[2]) if len(args) > 2 else None)
