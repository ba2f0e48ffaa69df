"""Trainer tests: overfit, schedulers vs torch reference, checkpoint/resume."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.trainer import Trainer  # noqa: E402
from transformers_tpu.training_args import ParallelismConfig, TrainingArguments  # noqa: E402


def tiny_model():
    config = ttpu.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, max_position_embeddings=64)
    return ttpu.LlamaForCausalLM(config)


def lm_dataset(n=64, seq=16, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(1, vocab, size=(n, seq))
    return [{"input_ids": row, "labels": row.copy()} for row in data]


def test_overfit_loss_decreases(tmp_path):
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1, max_steps=30,
        learning_rate=5e-3, logging_steps=10, save_strategy="no", seed=0,
        lr_scheduler_type="constant",
    )
    trainer = Trainer(model, args, train_dataset=lm_dataset(16))
    trainer.train()
    losses = [l["loss"] for l in trainer.state.log_history if "loss" in l]
    assert len(losses) >= 2
    assert losses[-1] < losses[0] - 0.5, losses


def test_scheduler_matches_torch_reference():
    """LR schedule values == reference optimization.get_scheduler."""
    import torch
    from transformers import get_scheduler as hf_get_scheduler

    from transformers_tpu.optimization import get_scheduler

    for name in ["linear", "cosine", "constant_with_warmup", "polynomial", "inverse_sqrt"]:
        base_lr = 0.1
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
        hf_sched = hf_get_scheduler(name, opt, num_warmup_steps=4, num_training_steps=20)
        ours = get_scheduler(name, base_lr, num_warmup_steps=4, num_training_steps=20)
        for step in range(20):
            expected = opt.param_groups[0]["lr"]
            got = float(ours(step))
            assert abs(got - expected) < 1e-6, (name, step, got, expected)
            opt.step()
            hf_sched.step()


def test_gradient_accumulation_equivalence(tmp_path):
    """GA=2 with half micro-batch == GA=1 full batch (same data, same updates)."""
    data = lm_dataset(8, seed=1)

    def run(ga, bs):
        model = tiny_model()
        args = TrainingArguments(
            output_dir=str(tmp_path / f"ga{ga}"), per_device_train_batch_size=bs,
            gradient_accumulation_steps=ga, max_steps=3, learning_rate=1e-3,
            logging_steps=1, save_strategy="no", seed=0, lr_scheduler_type="constant",
        )
        trainer = Trainer(model, args, train_dataset=data)
        trainer.train()
        return [l["loss"] for l in trainer.state.log_history if "loss" in l]

    l1 = run(1, 4)
    l2 = run(2, 2)
    np.testing.assert_allclose(l1, l2, atol=1e-5)


def test_checkpoint_resume(tmp_path):
    data = lm_dataset(32, seed=2)

    def make(out):
        model = tiny_model()
        args = TrainingArguments(
            output_dir=out, per_device_train_batch_size=4, max_steps=8,
            learning_rate=1e-3, logging_steps=1, save_steps=4, save_strategy="steps",
            seed=0, lr_scheduler_type="constant",
        )
        return Trainer(model, args, train_dataset=data)

    t1 = make(str(tmp_path / "full"))
    t1.train()
    full_losses = [l["loss"] for l in t1.state.log_history if "loss" in l]

    t2 = make(str(tmp_path / "partial"))
    t2.args.max_steps = 4
    t2.state.max_steps = 4
    t2.train()
    ckpt = str(Path(t2.args.output_dir) / "checkpoint-4")

    t3 = make(str(tmp_path / "resumed"))
    t3.train(resume_from_checkpoint=ckpt)
    # log_history carries the restored steps 1-4 then the new steps 5-8
    resumed_losses = [l["loss"] for l in t3.state.log_history
                      if "loss" in l and l["step"] > 4]
    np.testing.assert_allclose(full_losses[4:], resumed_losses, atol=1e-5)


def test_evaluate_and_predict(tmp_path):
    model = tiny_model()
    args = TrainingArguments(output_dir=str(tmp_path), per_device_train_batch_size=1,
                             per_device_eval_batch_size=1, max_steps=2, save_strategy="no", logging_steps=1)
    trainer = Trainer(model, args, train_dataset=lm_dataset(8), eval_dataset=lm_dataset(8, seed=3))
    trainer.train()
    metrics = trainer.evaluate()
    assert "eval_loss" in metrics and np.isfinite(metrics["eval_loss"])
    logits, labels = trainer.predict(lm_dataset(4, seed=4))
    assert logits.shape[0] == 4


def test_trainer_with_mesh_parallelism(tmp_path):
    """dp x tp mesh on the 8 virtual CPU devices."""
    model = tiny_model()
    args = TrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1, max_steps=3,
        save_strategy="no", logging_steps=1, learning_rate=1e-3,
        parallelism_config=ParallelismConfig(dp_size=2, fsdp_size=2, tp_size=2),
    )
    trainer = Trainer(model, args, train_dataset=lm_dataset(32))
    trainer.train()
    losses = [l["loss"] for l in trainer.state.log_history if "loss" in l]
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)


def test_jit_checkpoint_on_preemption(tmp_path):
    from transformers_tpu import JITCheckpointCallback

    cb = JITCheckpointCallback()

    class TriggerAtStep2(ttpu.TrainerCallback):
        def on_step_end(self, args, state, control, **kwargs):
            if state.global_step == 2:
                cb._preempted.set()
            return control

    model = tiny_model()
    args = TrainingArguments(output_dir=str(tmp_path), per_device_train_batch_size=1,
                             max_steps=10, save_strategy="no", logging_steps=1)
    trainer = Trainer(model, args, train_dataset=lm_dataset(32),
                      callbacks=[TriggerAtStep2(), cb])
    trainer.train()
    # stopped early and wrote a checkpoint at the preemption step
    assert trainer.state.global_step == 2
    assert (Path(tmp_path) / "checkpoint-2").exists()


def test_distributed_eval_matches_single_device(tmp_path):
    """dp x fsdp eval (r4 verdict task 8): evaluate() under a 2x2x2 mesh
    gathers per-shard metrics into the same numbers a replicated eval
    produces, and compute_metrics sees the FULL gathered logits/labels."""
    model = tiny_model()
    seen = {}

    def compute_metrics(pack):
        logits, labels = pack
        seen["n"] = logits.shape[0]
        return {"mean_logit": float(np.mean(logits))}

    def make(parallelism):
        args = TrainingArguments(
            output_dir=str(tmp_path / ("mesh" if parallelism else "rep")),
            per_device_eval_batch_size=1, max_steps=1, save_strategy="no",
            logging_steps=1, parallelism_config=parallelism)
        return Trainer(model, args, train_dataset=lm_dataset(8),
                       eval_dataset=lm_dataset(16, seed=5),
                       compute_metrics=compute_metrics)

    base = make(None).evaluate()
    assert seen["n"] == 16
    sharded = make(ParallelismConfig(dp_size=2, fsdp_size=2, tp_size=2)).evaluate()
    assert seen["n"] == 16  # gather-object semantics: all rows surface
    np.testing.assert_allclose(sharded["eval_loss"], base["eval_loss"], atol=1e-4)
    np.testing.assert_allclose(sharded["eval_mean_logit"], base["eval_mean_logit"],
                               atol=1e-4)


def test_training_args_surface_completion():
    import dataclasses

    from transformers_tpu.training_args import TrainingArguments

    assert len(dataclasses.fields(TrainingArguments)) >= 120
    # rejected torch-runtime knob
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TrainingArguments(deepspeed="ds.json")
    # torch-style fsdp flag hints the mesh axis
    a = TrainingArguments(fsdp="full_shard")
    assert a.parallelism_config is not None and a.parallelism_config.fsdp_size > 1
