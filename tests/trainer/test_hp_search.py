"""Hyperparameter search (hp_search.py): built-in random/grid backends behind
the reference's optuna-style ``trainer.hyperparameter_search`` contract."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.hp_search import (  # noqa: E402
    BestRun,
    GridTrial,
    RandomTrial,
    default_compute_objective,
    grid_points,
)
from transformers_tpu.trainer import Trainer  # noqa: E402
from transformers_tpu.training_args import TrainingArguments  # noqa: E402


def tiny_model():
    config = ttpu.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=64)
    return ttpu.LlamaForCausalLM(config)


def lm_dataset(n=16, seq=16, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(1, vocab, size=(n, seq))
    return [{"input_ids": row, "labels": row.copy()} for row in data]


def test_random_trial_reproducible_and_bounded():
    a, b = RandomTrial(7), RandomTrial(7)
    for t in (a, b):
        lr = t.suggest_float("lr", 1e-6, 1e-2, log=True)
        assert 1e-6 <= lr <= 1e-2
        n = t.suggest_int("n", 2, 5)
        assert 2 <= n <= 5
        c = t.suggest_categorical("c", ["x", "y"])
        assert c in ("x", "y")
    assert a.params == b.params


def test_grid_points_cartesian():
    def space(trial):
        trial.suggest_categorical("a", [1, 2, 3])
        trial.suggest_float("b", 0.0, 1.0, step=0.5)
        trial.suggest_int("c", 1, 2)
    pts = grid_points(space)
    assert len(pts) == 3 * 3 * 2
    assert {"a": 1, "b": 0.0, "c": 1} in pts
    assert {"a": 3, "b": 1.0, "c": 2} in pts


def test_grid_requires_step_for_floats():
    with pytest.raises(ValueError, match="step"):
        grid_points(lambda t: t.suggest_float("lr", 0.0, 1.0))


def test_default_compute_objective():
    assert default_compute_objective({"eval_loss": 1.5}) == 1.5
    assert default_compute_objective(
        {"eval_loss": 1.5, "eval_accuracy": 0.8, "eval_f1": 0.6, "epoch": 2}
    ) == pytest.approx(1.4)


def test_hyperparameter_search_grid_selects_best_lr(tmp_path):
    """A grid over {tiny lr, workable lr}: the workable lr must win on
    eval loss after a short overfit run."""
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1, max_steps=12,
        learning_rate=1e-3, logging_steps=50, save_strategy="no", seed=0,
        lr_scheduler_type="constant",
    )
    data = lm_dataset(8)
    trainer = Trainer(model, args, train_dataset=data, eval_dataset=data)

    def space(trial):
        return {"learning_rate": trial.suggest_categorical(
            "learning_rate", [1e-7, 5e-3])}

    best = trainer.hyperparameter_search(hp_space=space, backend="grid",
                                         n_trials=4, direction="minimize")
    assert isinstance(best, BestRun)
    assert best.hyperparameters["learning_rate"] == 5e-3
    assert len(best.run_summary) == 2
    objectives = {r["learning_rate"]: r["objective"] for r in best.run_summary}
    assert objectives[5e-3] < objectives[1e-7]


def test_hyperparameter_search_random_backend(tmp_path):
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1, max_steps=4,
        learning_rate=1e-3, logging_steps=50, save_strategy="no", seed=0,
        lr_scheduler_type="constant",
    )
    data = lm_dataset(4)
    trainer = Trainer(model, args, train_dataset=data, eval_dataset=data)

    def space(trial):
        return {"learning_rate": trial.suggest_float("learning_rate", 1e-5, 1e-3, log=True)}

    best = trainer.hyperparameter_search(hp_space=space, backend="random", n_trials=2)
    assert isinstance(best, BestRun)
    assert 1e-5 <= best.hyperparameters["learning_rate"] <= 1e-3
    assert best.objective == min(r["objective"] for r in best.run_summary)


def test_unknown_hp_rejected(tmp_path):
    model = tiny_model()
    args = TrainingArguments(output_dir=str(tmp_path), max_steps=1, save_strategy="no")
    data = lm_dataset(2)
    trainer = Trainer(model, args, train_dataset=data, eval_dataset=data)
    with pytest.raises(AttributeError, match="unknown TrainingArguments"):
        trainer.hyperparameter_search(
            hp_space=lambda t: {"not_a_field": t.suggest_int("not_a_field", 1, 2)},
            backend="random", n_trials=1)
