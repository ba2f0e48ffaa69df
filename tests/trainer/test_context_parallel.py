"""Context-parallel training through Trainer.train() on the 8-CPU mesh.

The GSPMD analog of reference trainer.py:2235 _prepare_context_parallel_inputs:
sequence-dim buffers are sharded over the "sequence" mesh axis and labels are
pre-shifted host-side (shift_labels). CP runs must reproduce the unsharded
loss trajectory exactly (same global batch, same update math)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.trainer import Trainer  # noqa: E402
from transformers_tpu.training_args import ParallelismConfig, TrainingArguments  # noqa: E402


def tiny_model():
    config = ttpu.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=64)
    return ttpu.LlamaForCausalLM(config)


def lm_dataset(n=32, seq=16, vocab=64, seed=3):
    rng = np.random.default_rng(seed)
    data = rng.integers(1, vocab, size=(n, seq))
    return [{"input_ids": row, "labels": row.copy()} for row in data]


def run(tmp_path, tag, pc, batch_size=1):
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path / tag), per_device_train_batch_size=batch_size,
        max_steps=3, learning_rate=1e-3, logging_steps=1, save_strategy="no",
        seed=0, lr_scheduler_type="constant", parallelism_config=pc,
    )
    trainer = Trainer(model, args, train_dataset=lm_dataset())
    trainer.train()
    return [l["loss"] for l in trainer.state.log_history if "loss" in l]


def test_cp_matches_unsharded(tmp_path):
    base = run(tmp_path, "base", None)  # data=8 mesh
    cp = run(tmp_path, "cp", ParallelismConfig(dp_size=2, cp_size=4))
    assert len(base) == 3 and len(cp) == 3
    np.testing.assert_allclose(base, cp, atol=2e-5)


def test_cp_composes_with_fsdp_and_ga(tmp_path):
    # batch 16 unsharded == two GA micro-batches of 8 under fsdp x cp (same
    # loader order: same seed, same dataset; equal-sized micros => mean of
    # micro losses == full-batch loss)
    base = run(tmp_path, "base2", ParallelismConfig(dp_size=2, fsdp_size=4),
               batch_size=2)
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path / "cpga"), per_device_train_batch_size=1,
        gradient_accumulation_steps=2, max_steps=3, learning_rate=1e-3,
        logging_steps=1, save_strategy="no", seed=0, lr_scheduler_type="constant",
        parallelism_config=ParallelismConfig(dp_size=2, fsdp_size=2, cp_size=2),
    )
    trainer = Trainer(model, args, train_dataset=lm_dataset())
    trainer.train()
    cp = [l["loss"] for l in trainer.state.log_history if "loss" in l]
    assert len(cp) == 3
    np.testing.assert_allclose(base, cp, atol=2e-5)


def test_cp_shift_labels_equivalence():
    """Host-side pre-shift == model-internal shift on the same logits."""
    import jax.numpy as jnp

    model = tiny_model()
    params = model.init_params(0)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, size=(2, 8))
    out_labels = model(params, input_ids=jnp.asarray(ids), labels=jnp.asarray(ids))
    shift = np.concatenate([ids[:, 1:], np.full((2, 1), -100, ids.dtype)], axis=1)
    out_shift = model(params, input_ids=jnp.asarray(ids),
                      shift_labels=jnp.asarray(shift))
    np.testing.assert_allclose(float(out_labels.loss), float(out_shift.loss),
                               atol=1e-6)
