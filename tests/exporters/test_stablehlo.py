"""StableHLO export round-trip."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama, max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.exporters import StableHLOExporter, load_exported  # noqa: E402


def test_export_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    make_tiny_torch_llama(d, num_hidden_layers=2)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    out_dir = str(tmp_path / "exported")
    StableHLOExporter(model).save(out_dir, batch_size=1, seq_len=8)

    exported = load_exported(out_dir)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 99, size=(1, 8)), jnp.int32)
    ref = model(model.params, input_ids=ids).logits
    got = exported.call(ids)
    assert max_abs_diff(got, ref) < 1e-5
