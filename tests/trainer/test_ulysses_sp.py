"""Ulysses sequence parallelism through Trainer.train() on the 8-CPU mesh
(VERDICT r3 task 10): sp_size shards the sequence axis like CP, but attention
re-shards heads via all-to-all (the "ulysses" attention impl). Loss
trajectories must match the unsharded run exactly."""

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


def test_sp_matches_unsharded(tmp_path):
    base = run(tmp_path, "base", ParallelismConfig(dp_size=1))
    sp = run(tmp_path, "sp", ParallelismConfig(sp_size=4))
    np.testing.assert_allclose(sp, base, rtol=2e-4, err_msg=(sp, base))


def test_dp_x_sp_composition(tmp_path):
    base = run(tmp_path, "base2", ParallelismConfig(dp_size=2), batch_size=2)
    mixed = run(tmp_path, "dpsp", ParallelismConfig(dp_size=2, sp_size=4),
                batch_size=2)
    np.testing.assert_allclose(mixed, base, rtol=2e-4, err_msg=(mixed, base))


def test_sp_cp_mutually_exclusive():
    import pytest

    with pytest.raises(ValueError):
        ParallelismConfig(cp_size=2, sp_size=2)


def test_neftune_and_eval_on_start(tmp_path):
    """neftune_noise_alpha trains (loss finite, differs from noise-free) and
    eval_on_start runs an eval pass before step 0."""
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path / "neftune"), per_device_train_batch_size=1,
        max_steps=2, learning_rate=1e-3, logging_steps=1, save_strategy="no",
        seed=0, lr_scheduler_type="constant", neftune_noise_alpha=5.0,
        eval_on_start=True, eval_strategy="steps", eval_steps=100)
    trainer = Trainer(model, args, train_dataset=lm_dataset(),
                      eval_dataset=lm_dataset(n=4))
    trainer.train()
    losses = [l["loss"] for l in trainer.state.log_history if "loss" in l]
    evals = [l for l in trainer.state.log_history if "eval_loss" in l]
    assert len(losses) == 2 and all(np.isfinite(losses))
    assert evals, "eval_on_start produced no eval log"

    base = run(tmp_path, "nfbase", None)
    assert losses != base[:2]  # noise changed the trajectory


def test_sp_evaluate_outside_train(tmp_path):
    """evaluate()/predict() under Ulysses SP must work outside train() — the
    ulysses attention impl's with_sharding_constraint needs an ambient mesh
    (ADVICE r4 medium: eval_on_start crashed with 'requires a non-empty mesh')."""
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path / "speval"), per_device_train_batch_size=1,
        max_steps=2, learning_rate=1e-3, logging_steps=1, save_strategy="no",
        seed=0, lr_scheduler_type="constant",
        parallelism_config=ParallelismConfig(sp_size=4),
        eval_on_start=True, eval_strategy="steps", eval_steps=100)
    trainer = Trainer(model, args, train_dataset=lm_dataset(),
                      eval_dataset=lm_dataset(n=4))
    # evaluate before any training step: no train-step mesh context yet
    metrics = trainer.evaluate()
    assert np.isfinite(metrics["eval_loss"])
    trainer.train()
    evals = [l for l in trainer.state.log_history if "eval_loss" in l]
    assert evals and all(np.isfinite(e["eval_loss"]) for e in evals)
    logits, _ = trainer.predict(lm_dataset(n=2))
    assert np.isfinite(logits).all()
