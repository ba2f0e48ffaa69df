"""Hyperparameter search without external dependencies.

Reference parity: ``Trainer.hyperparameter_search`` (reference trainer.py:3024)
dispatches to optuna/ray/sigopt/wandb backends (reference
integrations/integration_utils.py:243 ``default_hp_search_backend``). None of
those run on this stack, so the search loop is implemented natively with two
backends — ``"random"`` (log-uniform/uniform sampling) and ``"grid"``
(Cartesian product) — behind the SAME user-facing contract: an optuna-style
``trial`` object with ``suggest_float/suggest_int/suggest_categorical``, a
``compute_objective`` over eval metrics, and a ``BestRun`` result. hp_space
functions written for the reference's optuna backend run unchanged.

Every trial is a fresh model init + train + evaluate; on TPU the train step
is already one donated jitted program, so trials reuse the compiled step
whenever the hyperparameters don't change its shape (e.g. learning-rate-only
searches compile once).
"""

from __future__ import annotations

import itertools
import math
import random
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from .utils import logging

logger = logging.get_logger(__name__)


@dataclass
class BestRun:
    """reference trainer_utils.py:289."""

    run_id: str
    objective: float
    hyperparameters: dict[str, Any]
    run_summary: Optional[list] = None


def default_compute_objective(metrics: dict) -> float:
    """reference trainer_utils.py:304: eval loss if it is the only metric,
    else the sum of all non-loss/runtime metrics."""
    metrics = dict(metrics)
    loss = metrics.pop("eval_loss", None)
    for k in list(metrics):
        if k.endswith("_runtime") or k.endswith("_per_second") or k == "epoch":
            metrics.pop(k)
    return float(loss) if not metrics else float(sum(v for v in metrics.values()
                                                     if isinstance(v, (int, float))))


def default_hp_space(trial) -> dict:
    """reference integration_utils.py default_hp_space_optuna."""
    return {
        "learning_rate": trial.suggest_float("learning_rate", 1e-6, 1e-4, log=True),
        "num_train_epochs": trial.suggest_int("num_train_epochs", 1, 5),
        "seed": trial.suggest_int("seed", 1, 40),
        "per_device_train_batch_size": trial.suggest_categorical(
            "per_device_train_batch_size", [4, 8, 16, 32, 64]),
    }


class RandomTrial:
    """Optuna-compatible suggest API over a seeded RNG."""

    def __init__(self, seed: int):
        self._rng = random.Random(seed)
        self.params: dict[str, Any] = {}

    def suggest_float(self, name, low, high, *, step=None, log=False):
        if log:
            value = math.exp(self._rng.uniform(math.log(low), math.log(high)))
        elif step:
            n = int((high - low) / step)
            value = low + step * self._rng.randint(0, n)
        else:
            value = self._rng.uniform(low, high)
        self.params[name] = value
        return value

    def suggest_int(self, name, low, high, *, step=1, log=False):
        if log:
            value = int(round(math.exp(self._rng.uniform(math.log(low), math.log(high)))))
            value = max(low, min(high, value))
        else:
            value = self._rng.randrange(low, high + 1, step)
        self.params[name] = value
        return value

    def suggest_categorical(self, name, choices):
        value = self._rng.choice(list(choices))
        self.params[name] = value
        return value


class GridTrial:
    """Records the choice axes on a dry pass, then replays one grid point.

    Floats/ints require ``step`` (or categorical choices) — a continuous
    dimension has no grid.
    """

    def __init__(self, point: Optional[dict] = None):
        self.axes: dict[str, list] = {}
        self.point = point or {}
        self.params: dict[str, Any] = {}

    def _axis(self, name, values):
        self.axes[name] = list(values)
        value = self.point.get(name, values[0])
        self.params[name] = value
        return value

    def suggest_float(self, name, low, high, *, step=None, log=False):
        if step is None:
            raise ValueError(
                f"grid backend needs `step` for float dimension {name!r}")
        n = int(round((high - low) / step))
        return self._axis(name, [low + i * step for i in range(n + 1)])

    def suggest_int(self, name, low, high, *, step=1, log=False):
        return self._axis(name, list(range(low, high + 1, step)))

    def suggest_categorical(self, name, choices):
        return self._axis(name, list(choices))


def grid_points(hp_space: Callable) -> list[dict]:
    probe = GridTrial()
    hp_space(probe)
    names = list(probe.axes)
    return [dict(zip(names, combo))
            for combo in itertools.product(*(probe.axes[n] for n in names))]


def run_hp_search(
    trainer,
    hp_space: Optional[Callable] = None,
    compute_objective: Optional[Callable] = None,
    n_trials: int = 20,
    direction: str = "minimize",
    backend: str = "random",
    seed: int = 42,
) -> BestRun:
    """The search loop behind ``Trainer.hyperparameter_search``."""
    hp_space = hp_space or default_hp_space
    compute_objective = compute_objective or default_compute_objective
    if direction not in ("minimize", "maximize"):
        raise ValueError(f"direction must be minimize|maximize, got {direction!r}")
    sign = 1.0 if direction == "minimize" else -1.0

    if backend == "grid":
        points = grid_points(hp_space)
        trials = [(str(i), GridTrial(p)) for i, p in enumerate(points)]
        if n_trials and len(trials) > n_trials:
            logger.warning(f"grid has {len(trials)} points; capping at n_trials={n_trials}")
            trials = trials[:n_trials]
    elif backend == "random":
        trials = [(str(i), RandomTrial(seed + i)) for i in range(n_trials)]
    else:
        raise ValueError(f"Unknown backend {backend!r}; built-in: random, grid "
                         "(optuna/ray/sigopt are not available on this stack)")

    best: Optional[BestRun] = None
    history = []
    for run_id, trial in trials:
        hp = hp_space(trial) if isinstance(trial, RandomTrial) else (
            hp_space(trial) or trial.params)
        objective = trainer._run_hp_trial(hp, compute_objective)
        history.append({"run_id": run_id, "objective": objective, **hp})
        logger.info(f"trial {run_id}: objective={objective:.6f} hp={hp}")
        if best is None or sign * objective < sign * best.objective:
            best = BestRun(run_id=run_id, objective=objective,
                           hyperparameters=dict(hp))
    best.run_summary = history
    return best
