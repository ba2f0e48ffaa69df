"""Trainer — the training loop on one jitted, mesh-sharded train step.

TPU-native analog of reference src/transformers/trainer.py (``train`` :1347 ->
``_inner_training_loop`` :1456 -> ``training_step`` :1892; ``evaluate`` :2554;
``_save_checkpoint`` :3079; ``_load_from_checkpoint`` :3326). Key design
differences (SURVEY §7):

- No wrapper stacks (DDP/FSDP/DeepSpeed): parallelism is ONE
  ``jax.sharding.Mesh`` (data/fsdp/tensor axes from
  ``TrainingArguments.parallelism_config``) + the model's ``_tp_plan``
  compiled to PartitionSpecs. XLA/GSPMD inserts every collective.
- The whole optimizer step (fwd, bwd, clip, optax update, GA scan) is one
  donated jitted function — per step the host only feeds the next batch.
- Checkpoints: model as hub-layout safetensors, optimizer state via orbax,
  TrainerState json, host RNG — resumable mid-epoch (dataloader
  fast-forward, reference trainer.py:1507).
"""

from __future__ import annotations

import math
import os
import shutil
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .optimization import create_optimizer, get_scheduler
from .parallel.mesh import DATA_AXIS, FSDP_AXIS, SEQUENCE_AXIS, make_mesh
from .parallel.plans import param_specs_with_plan
from .trainer_callback import (
    CallbackHandler,
    DefaultFlowCallback,
    PrinterCallback,
    TrainerControl,
    TrainerState,
)
from .training_args import TrainingArguments
from .utils import logging

logger = logging.get_logger(__name__)

TRAINER_STATE_NAME = "trainer_state.json"
OPTIMIZER_DIR = "optimizer"


class Trainer:
    """reference trainer.py:258."""

    def __init__(
        self,
        model,
        args: Optional[TrainingArguments] = None,
        data_collator: Optional[Callable] = None,
        train_dataset=None,
        eval_dataset=None,
        processing_class=None,
        compute_metrics: Optional[Callable] = None,
        callbacks: Optional[list] = None,
        compute_loss_func: Optional[Callable] = None,
    ):
        self.model = model
        self.args = args or TrainingArguments()
        from .data.data_collator import default_data_collator

        self.data_collator = data_collator or default_data_collator
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.processing_class = processing_class
        self.compute_metrics = compute_metrics
        self.compute_loss_func = compute_loss_func

        self.state = TrainerState()
        self.control = TrainerControl()
        from .integrations import get_reporting_callbacks

        reporters = get_reporting_callbacks(self.args.report_to)
        self.callback_handler = CallbackHandler(
            [DefaultFlowCallback()] + (callbacks or []) + reporters + [PrinterCallback()],
            model, processing_class)

        # ---- mesh + shardings
        pc = self.args.parallelism_config
        if pc is not None:
            seq_size = max(pc.cp_size, getattr(pc, "sp_size", 1))
            self.mesh = make_mesh(data=pc.dp_size, fsdp=pc.fsdp_size, tensor=pc.tp_size,
                                  sequence=seq_size,
                                  devices=jax.devices()[: pc.total()])
        else:
            self.mesh = make_mesh(data=len(jax.devices()))
        axis_sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        batch_axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS) if axis_sizes.get(a, 1) > 1)
        self.batch_sharding = NamedSharding(self.mesh, P(batch_axes if batch_axes else None))
        self.sp_enabled = pc is not None and getattr(pc, "sp_size", 1) > 1
        self.cp_enabled = (axis_sizes.get(SEQUENCE_AXIS, 1) > 1
                           and not self.sp_enabled)
        if self.sp_enabled:
            # Ulysses: attention re-shards heads over the sequence axis via
            # the "ulysses" attention impl (ops/attention.py); inputs get
            # the same seq-dim sharding + shift-label prep as CP
            model.config.attn_implementation = "ulysses"
        # [B, S] buffers sharded on (batch axes, sequence) under CP
        self.seq_sharding = NamedSharding(
            self.mesh, P(batch_axes if batch_axes else None, SEQUENCE_AXIS))
        self.param_specs = param_specs_with_plan(model, mesh=self.mesh)
        self.param_shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), self.param_specs,
            is_leaf=lambda x: isinstance(x, P))

        self.optimizer = None
        self.lr_schedule = None
        self._train_step_fn = None
        self.params = model.params if model.params is not None else model.init_params(self.args.seed)
        self.params = jax.tree.map(
            lambda v, s: jax.device_put(v, s), self.params, self.param_shardings)
        self.callback_handler.call_event("on_init_end", self.args, self.state, self.control)

    # ------------------------------------------------------------ dataloader
    def get_train_dataloader(self, epoch: int = 0):
        return self._dataloader(self.train_dataset, self.args.train_batch_size, shuffle=True,
                                epoch=epoch, drop_last=self.args.dataloader_drop_last)

    def get_eval_dataloader(self, dataset=None):
        return self._dataloader(dataset or self.eval_dataset, self.args.eval_batch_size,
                                shuffle=False, drop_last=False)

    def _dataloader(self, dataset, batch_size: int, shuffle: bool, epoch: int = 0,
                    drop_last: bool = False):
        n = len(dataset)
        idx = np.arange(n)
        if shuffle:
            # deterministic per-epoch order so resume reproduces the stream
            seed = self.args.data_seed if self.args.data_seed is not None else self.args.seed
            rng = np.random.default_rng(seed + epoch)
            rng.shuffle(idx)
            if self.args.group_by_length:
                idx = self._group_by_length(dataset, idx, batch_size)
        end = (n // batch_size) * batch_size if drop_last else n
        for start in range(0, end, batch_size):
            rows = [dataset[int(i)] for i in idx[start : start + batch_size]]
            yield self.data_collator(rows)

    def _group_by_length(self, dataset, idx: np.ndarray, batch_size: int) -> np.ndarray:
        """LengthGroupedSampler analog (reference trainer_pt_utils.py:563):
        shuffle, then sort by length inside megabatches of 50*batch so each
        batch pads to near-uniform lengths while the stream stays random."""
        col = self.args.length_column_name

        def length_of(i):
            row = dataset[int(i)]
            if col in row:
                return int(np.asarray(row[col]))
            return len(np.asarray(row["input_ids"]))

        mega = batch_size * 50
        out = []
        for start in range(0, len(idx), mega):
            chunk = idx[start : start + mega]
            out.append(sorted(chunk.tolist(), key=length_of, reverse=True))
        return np.asarray([i for c in out for i in c])

    def num_update_steps_per_epoch(self) -> int:
        n = len(self.train_dataset)
        steps = n // self.args.train_batch_size
        return max(steps // self.args.gradient_accumulation_steps, 1)

    # --------------------------------------------------------------- setup
    def create_optimizer_and_scheduler(self, num_training_steps: int):
        """reference trainer.py create_optimizer_and_scheduler."""
        args = self.args
        self.lr_schedule = get_scheduler(
            args.lr_scheduler_type, args.learning_rate,
            args.get_warmup_steps(num_training_steps), num_training_steps,
            args.lr_scheduler_kwargs)

        def no_decay_mask(params):
            # biases and norm scales (ndim <= 1) excluded from weight decay
            # (reference trainer.py get_decay_parameter_names)
            return jax.tree.map(lambda v: v.ndim > 1, params)

        self.optimizer = create_optimizer(
            args.optim, self.lr_schedule, weight_decay=args.weight_decay,
            adam_beta1=args.adam_beta1, adam_beta2=args.adam_beta2,
            adam_epsilon=args.adam_epsilon, max_grad_norm=args.max_grad_norm,
            decay_mask_fn=no_decay_mask)

    def _build_train_step(self):
        model = self.model
        optimizer = self.optimizer
        ga = self.args.gradient_accumulation_steps
        loss_fn_custom = self.compute_loss_func
        smoothing = self.args.label_smoothing_factor

        neftune_alpha = self.args.neftune_noise_alpha
        embed_path = (model.get_input_embedding_path()
                      if neftune_alpha else None)

        def loss_fn(params, batch):
            batch = dict(batch)
            if neftune_alpha and embed_path is not None and "input_ids" in batch:
                # NEFTune (reference trainer.py _activate_neftune): uniform
                # noise of magnitude alpha/sqrt(S*D) on the input embeddings,
                # training-time only; key derived from the step's token data
                from .utils.generic import get_nested

                table = get_nested(params, embed_path)
                ids = batch.pop("input_ids")
                embeds = jnp.take(table, ids, axis=0)
                key = jax.random.fold_in(jax.random.key(self.args.seed),
                                         jnp.sum(ids).astype(jnp.uint32))
                mag = neftune_alpha / jnp.sqrt(
                    jnp.asarray(embeds.shape[-2] * embeds.shape[-1], jnp.float32))
                noise = jax.random.uniform(key, embeds.shape, embeds.dtype,
                                           minval=-mag, maxval=mag)
                batch["inputs_embeds"] = embeds + noise
            if smoothing > 0 and loss_fn_custom is None:
                return self._smoothed_loss(model, params, batch, smoothing)
            out = model(params, **batch)
            if loss_fn_custom is not None:
                return loss_fn_custom(out, batch)
            return out.loss

        if self.args.gradient_checkpointing:
            # rematerialize the forward during backprop: activations are not
            # kept between fwd and bwd (reference gradient_checkpointing_enable
            # — per-layer there; whole-forward jax.checkpoint here, the
            # jit-native equivalent trade of FLOPs for HBM)
            loss_fn = jax.checkpoint(loss_fn)

        def train_step(params, opt_state, batch):
            if ga > 1:
                # batch leaves are [GA, B//GA, ...]; scan accumulates grads
                def micro(carry, mb):
                    loss, grads = jax.value_and_grad(loss_fn)(params, mb)
                    acc_loss, acc_grads = carry
                    return (acc_loss + loss, jax.tree.map(jnp.add, acc_grads, grads)), None

                zero = (jnp.zeros((), jnp.float32), jax.tree.map(jnp.zeros_like, params))
                (loss_sum, grad_sum), _ = jax.lax.scan(micro, zero, batch)
                loss = loss_sum / ga
                grads = jax.tree.map(lambda g: g / ga, grad_sum)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            grad_norm = optax.global_norm(grads)
            return params, opt_state, loss, grad_norm

        return jax.jit(train_step, donate_argnums=(0, 1))

    @staticmethod
    def _smoothed_loss(model, params, batch, eps):
        """Label-smoothed CE (reference trainer_pt_utils.py LabelSmoother:
        loss = (1-eps)*nll + eps*mean(-logprobs)), shift-by-one for causal
        LMs unless the batch already carries pre-shifted labels."""
        batch = dict(batch)
        labels = batch.pop("shift_labels", None)
        shifted = labels is not None
        if labels is None:
            labels = batch.pop("labels")
        out = model(params, **batch)
        logits = out.logits
        if not shifted:
            logits = logits[:, :-1, :]
            labels = labels[:, 1:]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(logp, axis=-1)
        per_tok = (1.0 - eps) * nll + eps * smooth
        count = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(jnp.where(valid, per_tok, 0.0)) / count

    # ---------------------------------------------------------------- train
    def train(self, resume_from_checkpoint: Optional[str] = None):
        args = self.args
        resume_from_checkpoint = resume_from_checkpoint or args.resume_from_checkpoint

        if args.eval_on_start and self.eval_dataset is not None:
            # reference trainer.py eval_on_start: one eval pass before step 0
            self.evaluate()

        steps_per_epoch = self.num_update_steps_per_epoch()
        if args.max_steps > 0:
            max_steps = args.max_steps
            num_epochs = math.ceil(max_steps / steps_per_epoch)
        else:
            max_steps = int(steps_per_epoch * args.num_train_epochs)
            num_epochs = int(math.ceil(args.num_train_epochs))
        self.state.max_steps = max_steps
        self.state.num_train_epochs = num_epochs

        self.create_optimizer_and_scheduler(max_steps)
        opt_state = self.optimizer.init(self.params)
        self._train_step_fn = self._build_train_step()

        start_step = 0
        if resume_from_checkpoint:
            opt_state = self._load_checkpoint(resume_from_checkpoint, opt_state)
            start_step = self.state.global_step
            # the loaded state carries the OLD run's horizon; this run's wins
            self.state.max_steps = max_steps
            self.state.num_train_epochs = num_epochs
            logger.info(f"Resuming from {resume_from_checkpoint} at step {start_step}")

        self.control = self.callback_handler.call_event(
            "on_train_begin", args, self.state, self.control)

        ga = args.gradient_accumulation_steps
        t0 = time.time()
        losses = []
        done = False
        seen_steps = 0  # optimizer steps encountered incl. skipped-on-resume
        for epoch in range(num_epochs):
            if done:
                break
            self.control = self.callback_handler.call_event(
                "on_epoch_begin", args, self.state, self.control)
            micro_batches = []
            for batch in self.get_train_dataloader(epoch):
                micro_batches.append(batch)
                if len(micro_batches) < ga:
                    continue
                seen_steps += 1
                # dataloader fast-forward on resume (reference trainer.py:1507)
                if seen_steps <= start_step and not args.ignore_data_skip:
                    micro_batches = []
                    continue
                if args.include_num_input_tokens_seen:
                    self.state.num_input_tokens_seen += sum(
                        int(np.asarray(mb["input_ids"]).size)
                        for mb in micro_batches if "input_ids" in mb)
                self.control._new_step()
                self.control = self.callback_handler.call_event(
                    "on_step_begin", args, self.state, self.control)
                batch = self._stack_and_shard(micro_batches)
                micro_batches = []
                with self.mesh:
                    # ambient mesh: spec-only sharding constraints inside the
                    # model (ulysses attention) resolve against it
                    self.params, opt_state, loss, grad_norm = self._train_step_fn(
                        self.params, opt_state, batch)
                self.state.global_step += 1
                self.state.epoch = epoch + (self.state.global_step % max(steps_per_epoch, 1)) / max(steps_per_epoch, 1)
                losses.append(loss)
                self.control = self.callback_handler.call_event(
                    "on_step_end", args, self.state, self.control)
                if self.control.should_log:
                    mean_loss = float(np.mean([float(l) for l in losses]))
                    losses = []
                    lr = float(self.lr_schedule(self.state.global_step))
                    logs = {"loss": round(mean_loss, 6), "learning_rate": lr,
                            "grad_norm": float(grad_norm), "epoch": round(self.state.epoch, 4),
                            "step": self.state.global_step}
                    self.state.log_history.append(logs)
                    self.control = self.callback_handler.call_event(
                        "on_log", args, self.state, self.control, logs=logs)
                if self.control.should_evaluate and self.eval_dataset is not None:
                    self.evaluate()
                if self.control.should_save:
                    self._save_checkpoint(opt_state)
                    self._track_best_checkpoint()
                if self.state.global_step >= max_steps or self.control.should_training_stop:
                    done = True
                    break
            self.control = self.callback_handler.call_event(
                "on_epoch_end", args, self.state, self.control)
            if self.control.should_evaluate and self.eval_dataset is not None:
                self.evaluate()
                self.control.should_evaluate = False
            if self.control.should_save:
                self._save_checkpoint(opt_state)
                self._track_best_checkpoint()
                self.control.should_save = False

        self._last_opt_state = opt_state
        if args.load_best_model_at_end and self.state.best_model_checkpoint:
            logger.info(f"Loading best model from {self.state.best_model_checkpoint} "
                        f"({args.metric_for_best_model}={self.state.best_metric})")
            loaded = type(self.model).from_pretrained(
                self.state.best_model_checkpoint, dtype=None)
            self.params = jax.tree.map(
                lambda v, s: jax.device_put(v, s), loaded.params, self.param_shardings)
        self.model.params = self.params
        train_time = time.time() - t0
        self.control = self.callback_handler.call_event(
            "on_train_end", args, self.state, self.control)
        metrics = {"train_runtime": train_time,
                   "train_steps_per_second": self.state.global_step / max(train_time, 1e-9)}
        return metrics

    def _stack_and_shard(self, micro_batches: list[dict]) -> dict:
        ga = self.args.gradient_accumulation_steps
        if self.cp_enabled or self.sp_enabled:
            micro_batches = [self._prepare_context_parallel_inputs(mb)
                             for mb in micro_batches]
        if ga > 1:
            batch = {k: np.stack([np.asarray(mb[k]) for mb in micro_batches])
                     for k in micro_batches[0]}
        else:
            batch = {k: np.asarray(v) for k, v in micro_batches[0].items()}

        # sequence-dim buffers get the extra "sequence" shard under CP
        seq_keys = {"input_ids", "labels", "shift_labels", "position_ids",
                    "attention_mask"} if (self.cp_enabled or self.sp_enabled) else set()

        def put(k, x):
            base = self.seq_sharding if (k in seq_keys and x.ndim >= 2) \
                else self.batch_sharding
            if ga > 1:
                return jax.device_put(x, NamedSharding(self.mesh, P(None, *base.spec)))
            return jax.device_put(x, base)

        return {k: put(k, v) for k, v in batch.items()}

    def _prepare_context_parallel_inputs(self, inputs: dict) -> dict:
        """Host-side CP prep (reference trainer.py:2235): the shift-by-one of
        the causal-LM loss crosses shard boundaries once the sequence dim is
        sharded, so labels are pre-shifted here and passed as ``shift_labels``;
        position_ids are materialized so every shard knows its absolute
        offsets."""
        inputs = dict(inputs)
        ids = np.asarray(inputs["input_ids"])
        if "shift_labels" not in inputs and "labels" in inputs:
            labels = np.asarray(inputs["labels"])
            inputs["shift_labels"] = np.concatenate(
                [labels[:, 1:], np.full((labels.shape[0], 1), -100, labels.dtype)], axis=1)
            del inputs["labels"]
        if "position_ids" not in inputs:
            inputs["position_ids"] = np.broadcast_to(
                np.arange(ids.shape[1], dtype=np.int32), ids.shape)
        return inputs

    def _put_batch_leaf(self, x):
        """Shard a batch leaf on the data axes; replicate when the row count
        does not divide the data-parallel size (trailing eval batch)."""
        shards = 1
        for a in self.batch_sharding.spec:
            if a is not None:
                axes = a if isinstance(a, tuple) else (a,)
                for ax in axes:
                    shards *= dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get(ax, 1)
        if x.shape[0] % max(shards, 1) == 0:
            return jax.device_put(x, self.batch_sharding)
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    # ------------------------------------------------------------- evaluate
    def evaluate(self, eval_dataset=None, metric_key_prefix: str = "eval") -> dict:
        """reference trainer.py:2554."""
        dataset = eval_dataset or self.eval_dataset
        model = self.model

        @jax.jit
        def eval_step(params, batch):
            out = model(params, **batch)
            return out.loss, out.logits

        losses = []
        all_logits = []
        all_labels = []
        # trace/run under the mesh: ulysses attention (and any
        # with_sharding_constraint in the model) needs an ambient mesh even
        # outside train(); eval_on_start runs before the first train step
        with self.mesh:
            for batch in self.get_eval_dataloader(dataset):
                labels = batch.get("labels")
                jbatch = {k: self._put_batch_leaf(np.asarray(v)) for k, v in batch.items()}
                loss, logits = eval_step(self.params, jbatch)
                losses.append(float(loss))
                if self.compute_metrics is not None:
                    all_logits.append(np.asarray(logits))
                    all_labels.append(np.asarray(labels))
        metrics = {f"{metric_key_prefix}_loss": float(np.mean(losses)) if losses else float("nan")}
        if self.compute_metrics is not None and all_logits:
            extra = self.compute_metrics(
                (np.concatenate(all_logits), np.concatenate(all_labels)))
            metrics.update({f"{metric_key_prefix}_{k}": v for k, v in extra.items()})
        self.state.log_history.append(metrics)
        self.control = self.callback_handler.call_event(
            "on_evaluate", self.args, self.state, self.control, metrics=metrics)
        return metrics

    # -------------------------------------------------- hyperparameter search
    def hyperparameter_search(self, hp_space=None, compute_objective=None,
                              n_trials: int = 20, direction: str = "minimize",
                              backend: str = "random", **kwargs):
        """reference trainer.py:3024 — optuna-style trials over built-in
        dependency-free backends ("random" | "grid"); see hp_search.py."""
        from .hp_search import run_hp_search

        return run_hp_search(self, hp_space=hp_space,
                             compute_objective=compute_objective,
                             n_trials=n_trials, direction=direction,
                             backend=backend, **kwargs)

    def _run_hp_trial(self, hp: dict, compute_objective) -> float:
        """One trial: apply hyperparameters, fresh params + state, train,
        evaluate, score."""
        for name, value in hp.items():
            if not hasattr(self.args, name):
                raise AttributeError(f"hp_space suggested unknown TrainingArguments field {name!r}")
            setattr(self.args, name, value)
        self.state = TrainerState()
        self.control = TrainerControl()
        self.optimizer = None
        self.lr_schedule = None
        self._train_step_fn = None
        self.params = jax.tree.map(
            lambda v, s: jax.device_put(v, s),
            self.model.init_params(int(getattr(self.args, "seed", 0) or 0)),
            self.param_shardings)
        self.train()
        metrics = self.evaluate()
        return float(compute_objective(metrics))

    def predict(self, test_dataset) -> tuple:
        model = self.model

        @jax.jit
        def fwd(params, batch):
            return model(params, **batch).logits

        outs = []
        labels = []
        with self.mesh:
            for batch in self.get_eval_dataloader(test_dataset):
                labels.append(np.asarray(batch.get("labels"))) if "labels" in batch else None
                jbatch = {k: self._put_batch_leaf(np.asarray(v))
                          for k, v in batch.items() if k != "labels"}
                outs.append(np.asarray(fwd(self.params, jbatch)))
        return np.concatenate(outs), (np.concatenate(labels) if labels else None)

    # ----------------------------------------------------------- checkpoints
    def save_model(self, output_dir: Optional[str] = None):
        output_dir = output_dir or self.args.output_dir
        self.model.save_pretrained(output_dir, params=self.params)
        if self.processing_class is not None and hasattr(self.processing_class, "save_pretrained"):
            self.processing_class.save_pretrained(output_dir)

    def _track_best_checkpoint(self):
        """Record best_metric/best_model_checkpoint after a save (reference
        trainer.py _determine_best_metric)."""
        args = self.args
        if args.metric_for_best_model is None:
            return
        key = args.metric_for_best_model
        if not key.startswith("eval_"):
            key = f"eval_{key}"
        value = None
        for entry in reversed(self.state.log_history):
            if key in entry:
                value = float(entry[key])
                break
        if value is None:
            return
        better = (self.state.best_metric is None
                  or (value > self.state.best_metric if args.greater_is_better
                      else value < self.state.best_metric))
        if better:
            self.state.best_metric = value
            self.state.best_model_checkpoint = os.path.join(
                args.output_dir, f"checkpoint-{self.state.global_step}")

    def _save_checkpoint(self, opt_state):
        """reference trainer.py:3079 (model + optimizer + state + rotation)."""
        ckpt_dir = os.path.join(self.args.output_dir, f"checkpoint-{self.state.global_step}")
        os.makedirs(ckpt_dir, exist_ok=True)
        self.save_model(ckpt_dir)
        if not self.args.save_only_model:
            self._save_opt_state(os.path.join(ckpt_dir, OPTIMIZER_DIR), opt_state)
        self.state.save_to_json(os.path.join(ckpt_dir, TRAINER_STATE_NAME))
        self.control = self.callback_handler.call_event(
            "on_save", self.args, self.state, self.control)
        self._rotate_checkpoints()

    def _rotate_checkpoints(self):
        limit = self.args.save_total_limit
        if not limit:
            return
        out = self.args.output_dir
        ckpts = sorted(
            (d for d in os.listdir(out) if d.startswith("checkpoint-")),
            key=lambda d: int(d.split("-")[-1]))
        best = os.path.basename(self.state.best_model_checkpoint or "")
        for stale in ckpts[:-limit]:
            if stale == best:  # never rotate away the best checkpoint
                continue
            shutil.rmtree(os.path.join(out, stale), ignore_errors=True)

    def _save_opt_state(self, path, opt_state):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        if os.path.exists(path):
            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, opt_state)
            ckptr.wait_until_finished()

    def _load_checkpoint(self, ckpt_dir, opt_state_template):
        import orbax.checkpoint as ocp

        self.state = TrainerState.load_from_json(os.path.join(ckpt_dir, TRAINER_STATE_NAME))
        # model weights
        loaded = type(self.model).from_pretrained(ckpt_dir, dtype=None)
        self.params = jax.tree.map(
            lambda v, s: jax.device_put(v, s), loaded.params, self.param_shardings)
        if not os.path.isdir(os.path.join(ckpt_dir, OPTIMIZER_DIR)):
            logger.warning("No optimizer state in checkpoint (save_only_model); "
                           "resuming with a fresh optimizer")
            return opt_state_template
        with ocp.StandardCheckpointer() as ckptr:
            opt_state = ckptr.restore(
                os.path.abspath(os.path.join(ckpt_dir, OPTIMIZER_DIR)),
                jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), opt_state_template))
        return opt_state
