"""Just-in-time preemption checkpointing.

TPU-native analog of reference src/transformers/trainer_jit_checkpoint.py
(``CheckpointManager`` :13, ``JITCheckpointCallback`` :79): a SIGTERM (TPU
maintenance event / spot preemption) arms a flag; the trainer saves a full
checkpoint at the next step boundary and stops. SURVEY §5.3 marks this
load-bearing on TPU.
"""

from __future__ import annotations

import signal
import threading

from .trainer_callback import TrainerCallback
from .utils import logging

logger = logging.get_logger(__name__)


class JITCheckpointCallback(TrainerCallback):
    """Attach to a Trainer: `Trainer(..., callbacks=[JITCheckpointCallback()])`."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._preempted = threading.Event()
        self._signals = signals
        self._prev_handlers = {}

    def _handler(self, signum, frame):
        logger.warning(f"Received signal {signum}: arming just-in-time checkpoint")
        self._preempted.set()

    def on_train_begin(self, args, state, control, **kwargs):
        for sig in self._signals:
            try:
                self._prev_handlers[sig] = signal.signal(sig, self._handler)
            except ValueError:
                # not the main thread — polling still works if .set() is called
                pass

    def on_step_end(self, args, state, control, **kwargs):
        if self._preempted.is_set():
            control.should_save = True
            control.should_training_stop = True
        return control

    def on_train_end(self, args, state, control, **kwargs):
        for sig, prev in self._prev_handlers.items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                pass
