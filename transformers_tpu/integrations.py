"""Reporting callbacks (reference src/transformers/integrations/
integration_utils.py — TensorBoard :577, W&B :695, MLflow :1286...).

Each callback gates on its backend's availability and is selected by
``TrainingArguments.report_to``.
"""

from __future__ import annotations

import importlib.util
import json
import os
from typing import Optional

from .trainer_callback import TrainerCallback
from .utils import logging

logger = logging.get_logger(__name__)


def is_tensorboard_available() -> bool:
    return (importlib.util.find_spec("tensorboardX") is not None
            or importlib.util.find_spec("torch.utils.tensorboard") is not None)


def is_wandb_available() -> bool:
    return importlib.util.find_spec("wandb") is not None


class TensorBoardCallback(TrainerCallback):
    """reference integration_utils.py:577."""

    def __init__(self, tb_writer=None):
        self.tb_writer = tb_writer

    def _init_writer(self, args):
        if self.tb_writer is not None:
            return
        log_dir = os.path.join(args.output_dir, "runs")
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:
            from tensorboardX import SummaryWriter  # type: ignore[no-redef]
        self.tb_writer = SummaryWriter(log_dir=log_dir)

    def on_train_begin(self, args, state, control, **kwargs):
        self._init_writer(args)
        self.tb_writer.add_text("args", args.to_json_string())

    def on_log(self, args, state, control, logs=None, **kwargs):
        if self.tb_writer is None or not logs:
            return
        for k, v in logs.items():
            if isinstance(v, (int, float)):
                self.tb_writer.add_scalar(k, v, state.global_step)
        self.tb_writer.flush()

    def on_train_end(self, args, state, control, **kwargs):
        if self.tb_writer is not None:
            self.tb_writer.close()
            self.tb_writer = None


class WandbCallback(TrainerCallback):
    """reference integration_utils.py:695."""

    def __init__(self):
        if not is_wandb_available():
            raise RuntimeError("WandbCallback requires wandb")
        import wandb

        self._wandb = wandb
        self._initialized = False

    def on_train_begin(self, args, state, control, **kwargs):
        if not self._initialized:
            self._wandb.init(project=os.environ.get("WANDB_PROJECT", "transformers_tpu"),
                             config=args.to_dict())
            self._initialized = True

    def on_log(self, args, state, control, logs=None, **kwargs):
        if logs:
            self._wandb.log({k: v for k, v in logs.items() if isinstance(v, (int, float))},
                            step=state.global_step)

    def on_train_end(self, args, state, control, **kwargs):
        if self._initialized:
            self._wandb.finish()


def is_mlflow_available() -> bool:
    return importlib.util.find_spec("mlflow") is not None


def is_comet_available() -> bool:
    return importlib.util.find_spec("comet_ml") is not None


class MLflowCallback(TrainerCallback):
    """reference integration_utils.py:1286 — params at train begin, metrics
    per log, run closed at train end. MLFLOW_EXPERIMENT_NAME /
    MLFLOW_TRACKING_URI env vars are honored by mlflow itself."""

    # mlflow caps (reference MLflowCallback uses mlflow's own validation caps)
    MAX_PARAM_VAL_LENGTH = 250

    def __init__(self):
        if not is_mlflow_available():
            raise RuntimeError("MLflowCallback requires mlflow")
        import mlflow

        self._ml = mlflow
        self._initialized = False

    def on_train_begin(self, args, state, control, **kwargs):
        if self._initialized:
            return
        if self._ml.active_run() is None:
            self._ml.start_run(run_name=getattr(args, "run_name", None))
        params = {k: str(v)[: self.MAX_PARAM_VAL_LENGTH]
                  for k, v in args.to_dict().items() if v is not None}
        # mlflow rejects >100 params per call; chunk like the reference
        items = list(params.items())
        for i in range(0, len(items), 100):
            self._ml.log_params(dict(items[i : i + 100]))
        self._initialized = True

    def on_log(self, args, state, control, logs=None, **kwargs):
        if not self._initialized or not logs:
            return
        metrics = {k: float(v) for k, v in logs.items() if isinstance(v, (int, float))}
        if metrics:
            self._ml.log_metrics(metrics=metrics, step=state.global_step)

    def on_train_end(self, args, state, control, **kwargs):
        if self._initialized and self._ml.active_run() is not None:
            self._ml.end_run()
            self._initialized = False


class CometCallback(TrainerCallback):
    """reference integration_utils.py:943 — one Experiment per run."""

    def __init__(self):
        if not is_comet_available():
            raise RuntimeError("CometCallback requires comet_ml")
        import comet_ml

        self._comet = comet_ml
        self._experiment = None

    def on_train_begin(self, args, state, control, **kwargs):
        if self._experiment is None:
            self._experiment = self._comet.Experiment(
                project_name=os.environ.get("COMET_PROJECT_NAME", "transformers_tpu"))
            self._experiment.log_parameters(args.to_dict())

    def on_log(self, args, state, control, logs=None, **kwargs):
        if self._experiment is not None and logs:
            self._experiment.log_metrics(
                {k: v for k, v in logs.items() if isinstance(v, (int, float))},
                step=state.global_step)

    def on_train_end(self, args, state, control, **kwargs):
        if self._experiment is not None:
            self._experiment.end()
            self._experiment = None




def is_neptune_available() -> bool:
    return importlib.util.find_spec("neptune") is not None


def is_clearml_available() -> bool:
    return importlib.util.find_spec("clearml") is not None


def is_codecarbon_available() -> bool:
    return importlib.util.find_spec("codecarbon") is not None


def is_swanlab_available() -> bool:
    return importlib.util.find_spec("swanlab") is not None


class NeptuneCallback(TrainerCallback):
    """reference integration_utils.py:1527 — run created at train begin,
    per-log metrics appended under a metrics namespace, run stopped at end."""

    def __init__(self, run=None, base_namespace: str = "finetuning"):
        if not is_neptune_available():
            raise RuntimeError("NeptuneCallback requires the neptune package")
        import neptune

        self._neptune = neptune
        self._run = run
        self._base = base_namespace

    def on_train_begin(self, args, state, control, **kwargs):
        if self._run is None:
            self._run = self._neptune.init_run(
                name=getattr(args, "run_name", None) or None)
        self._run[f"{self._base}/hyperparameters"] = {
            k: str(v) for k, v in args.to_dict().items() if v is not None}

    def on_log(self, args, state, control, logs=None, **kwargs):
        if self._run is None or not logs:
            return
        for k, v in logs.items():
            if isinstance(v, (int, float)):
                self._run[f"{self._base}/{k}"].append(
                    float(v), step=state.global_step)

    def on_train_end(self, args, state, control, **kwargs):
        if self._run is not None:
            self._run.stop()
            self._run = None


class ClearMLCallback(TrainerCallback):
    """reference integration_utils.py:1843 — Task.init, connected args,
    scalar reporting per log."""

    def __init__(self):
        if not is_clearml_available():
            raise RuntimeError("ClearMLCallback requires the clearml package")
        import clearml

        self._clearml = clearml
        self._task = None

    def on_train_begin(self, args, state, control, **kwargs):
        if self._task is None:
            self._task = self._clearml.Task.init(
                project_name=os.environ.get("CLEARML_PROJECT", "transformers_tpu"),
                task_name=os.environ.get("CLEARML_TASK",
                                         getattr(args, "run_name", None) or "Trainer"))
            self._task.connect(args.to_dict(), name="TrainingArguments")

    def on_log(self, args, state, control, logs=None, **kwargs):
        if self._task is None or not logs:
            return
        logger_ = self._task.get_logger()
        for k, v in logs.items():
            if isinstance(v, (int, float)):
                logger_.report_scalar(title="train", series=k,
                                      value=float(v),
                                      iteration=state.global_step)

    def on_train_end(self, args, state, control, **kwargs):
        if self._task is not None:
            self._task.close()
            self._task = None


class CodeCarbonCallback(TrainerCallback):
    """reference integration_utils.py:1809 — emissions tracking across the
    training run."""

    def __init__(self):
        if not is_codecarbon_available():
            raise RuntimeError("CodeCarbonCallback requires codecarbon")
        import codecarbon

        self._codecarbon = codecarbon
        self._tracker = None

    def on_init_end(self, args, state, control, **kwargs):
        if self._tracker is None:
            self._tracker = self._codecarbon.EmissionsTracker(
                output_dir=args.output_dir, log_level="error")

    def on_train_begin(self, args, state, control, **kwargs):
        if self._tracker is not None:
            self._tracker.start()

    def on_train_end(self, args, state, control, **kwargs):
        if self._tracker is not None:
            self._tracker.stop()


class SwanlabCallback(TrainerCallback):
    """reference integration_utils.py:2262 — swanlab.init + per-log metrics."""

    def __init__(self):
        if not is_swanlab_available():
            raise RuntimeError("SwanlabCallback requires swanlab")
        import swanlab

        self._swanlab = swanlab
        self._initialized = False

    def on_train_begin(self, args, state, control, **kwargs):
        if not self._initialized:
            self._swanlab.init(
                project=os.environ.get("SWANLAB_PROJECT", "transformers_tpu"),
                experiment_name=getattr(args, "run_name", None) or None,
                config={k: str(v) for k, v in args.to_dict().items()
                        if v is not None})
            self._initialized = True

    def on_log(self, args, state, control, logs=None, **kwargs):
        if not self._initialized or not logs:
            return
        metrics = {k: float(v) for k, v in logs.items()
                   if isinstance(v, (int, float))}
        if metrics:
            self._swanlab.log(metrics, step=state.global_step)

    def on_train_end(self, args, state, control, **kwargs):
        if self._initialized:
            self._swanlab.finish()
            self._initialized = False


REPORTER_REGISTRY = {
    "tensorboard": TensorBoardCallback,
    "wandb": WandbCallback,
    "mlflow": MLflowCallback,
    "comet_ml": CometCallback,
    "neptune": NeptuneCallback,
    "clearml": ClearMLCallback,
    "codecarbon": CodeCarbonCallback,
    "swanlab": SwanlabCallback,
}


def get_reporting_callbacks(report_to) -> list:
    if not report_to or report_to in ("none", ["none"]):
        return []
    if isinstance(report_to, str):
        report_to = [report_to]
    out = []
    for name in report_to:
        if name == "all":
            if is_tensorboard_available():
                out.append(TensorBoardCallback())
            if is_wandb_available():
                out.append(WandbCallback())
            if is_mlflow_available():
                out.append(MLflowCallback())
            if is_comet_available():
                out.append(CometCallback())
            continue
        if name not in REPORTER_REGISTRY:
            logger.warning(f"Unknown reporter {name!r}; known: {sorted(REPORTER_REGISTRY)}")
            continue
        out.append(REPORTER_REGISTRY[name]())
    return out
