"""TrainingArguments surface: label smoothing parity vs reference, gradient
checkpointing equivalence, best-model tracking, early stopping, grouped
lengths, MLflow reporter (stubbed backend)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu import EarlyStoppingCallback  # noqa: E402
from transformers_tpu.trainer import Trainer  # noqa: E402
from transformers_tpu.training_args import TrainingArguments  # noqa: E402


def tiny_model():
    config = ttpu.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=64)
    return ttpu.LlamaForCausalLM(config)


def lm_dataset(n=16, seq=8, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(1, vocab, size=(n, seq))
    return [{"input_ids": row, "labels": row.copy()} for row in data]


def test_label_smoothing_matches_reference():
    """Trainer._smoothed_loss == reference trainer_pt_utils.LabelSmoother."""
    import torch
    from transformers.trainer_pt_utils import LabelSmoother

    model = tiny_model()
    params = model.init_params(0)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, size=(2, 8))
    labels = ids.copy()
    labels[0, :3] = -100  # partial ignore

    import jax.numpy as jnp
    got = float(Trainer._smoothed_loss(
        model, params, {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)},
        eps=0.1))

    logits = np.asarray(model(params, input_ids=jnp.asarray(ids)).logits)
    smoother = LabelSmoother(epsilon=0.1)
    out = {"logits": torch.from_numpy(logits.copy())}
    want = float(smoother(out, torch.from_numpy(labels), shift_labels=True))
    assert abs(got - want) < 1e-5, (got, want)


def test_gradient_checkpointing_same_losses(tmp_path):
    def run(gc):
        model = tiny_model()
        args = TrainingArguments(
            output_dir=str(tmp_path / f"gc{gc}"), per_device_train_batch_size=1,
            max_steps=3, learning_rate=1e-3, logging_steps=1, save_strategy="no",
            seed=0, lr_scheduler_type="constant", gradient_checkpointing=gc)
        trainer = Trainer(model, args, train_dataset=lm_dataset())
        trainer.train()
        return [l["loss"] for l in trainer.state.log_history if "loss" in l]

    np.testing.assert_allclose(run(False), run(True), atol=1e-6)


def test_best_model_tracking_and_early_stopping(tmp_path):
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1, max_steps=20,
        learning_rate=5e-3, logging_steps=2, eval_strategy="steps", eval_steps=2,
        save_strategy="steps", save_steps=2, save_total_limit=2,
        load_best_model_at_end=True, metric_for_best_model="loss",
        seed=0, lr_scheduler_type="constant")
    trainer = Trainer(model, args, train_dataset=lm_dataset(8),
                      eval_dataset=lm_dataset(4, seed=1),
                      callbacks=[EarlyStoppingCallback(early_stopping_patience=2)])
    trainer.train()
    assert trainer.state.best_metric is not None
    assert trainer.state.best_model_checkpoint is not None
    # rotation never deletes the best checkpoint
    import os
    assert os.path.isdir(trainer.state.best_model_checkpoint)
    # greater_is_better derived False for *loss
    assert trainer.args.greater_is_better is False


def test_group_by_length_batches(tmp_path):
    rng = np.random.default_rng(0)
    data = [{"input_ids": rng.integers(1, 64, size=(int(l),)),
             "labels": rng.integers(1, 64, size=(int(l),)),
             "length": int(l)}
            for l in rng.integers(4, 20, size=32)]
    model = tiny_model()
    args = TrainingArguments(output_dir=str(tmp_path), per_device_train_batch_size=1,
                             group_by_length=True, save_strategy="no")

    def collate(rows):  # lengths within a batch after grouping
        return {"lens": np.asarray([len(r["input_ids"]) for r in rows])}

    trainer = Trainer(model, args, data_collator=collate, train_dataset=data)
    lens = np.concatenate([b["lens"] for b in trainer.get_train_dataloader()])
    # one megabatch (32 < 50*batch) => the whole stream is length-sorted
    assert np.all(np.diff(lens) <= 0), lens


def test_mlflow_reporter_with_stub(tmp_path, monkeypatch):
    calls = {"params": [], "metrics": [], "ended": 0}
    import importlib.machinery

    stub = types.ModuleType("mlflow")
    stub.__spec__ = importlib.machinery.ModuleSpec("mlflow", loader=None)
    stub.active_run = lambda: None
    stub.start_run = lambda run_name=None: calls.setdefault("run", run_name)
    stub.log_params = lambda p: calls["params"].append(p)

    def log_metrics(metrics, step):
        calls["metrics"].append((step, metrics))
        stub.active_run = lambda: object()  # now a run is live

    stub.log_metrics = log_metrics
    stub.end_run = lambda: calls.__setitem__("ended", calls["ended"] + 1)
    monkeypatch.setitem(sys.modules, "mlflow", stub)

    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1, max_steps=2,
        logging_steps=1, save_strategy="no", report_to=["mlflow"],
        lr_scheduler_type="constant")
    trainer = Trainer(model, args, train_dataset=lm_dataset(8))
    trainer.train()
    assert calls["params"], "params never logged"
    assert any("loss" in m for _, m in calls["metrics"])
    assert calls["ended"] == 1


def test_fp16_maps_to_bf16(tmp_path):
    args = TrainingArguments(output_dir=str(tmp_path), fp16=True)
    assert args.bf16 is True and args.fp16 is False


def test_invalid_strategy_rejected(tmp_path):
    with pytest.raises(ValueError):
        TrainingArguments(output_dir=str(tmp_path), eval_strategy="sometimes")
    with pytest.raises(ValueError):
        TrainingArguments(output_dir=str(tmp_path), load_best_model_at_end=True)
