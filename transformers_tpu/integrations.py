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


REPORTER_REGISTRY = {
    "tensorboard": TensorBoardCallback,
    "wandb": WandbCallback,
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
            continue
        if name not in REPORTER_REGISTRY:
            logger.warning(f"Unknown reporter {name!r}; known: {sorted(REPORTER_REGISTRY)}")
            continue
        out.append(REPORTER_REGISTRY[name]())
    return out
