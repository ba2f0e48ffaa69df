"""TrainingArguments.

TPU-native analog of reference src/transformers/training_args.py (the
load-bearing subset of its ~180 fields, plus mesh-based ``parallelism_config``
replacing accelerate's — SURVEY §2.8: all parallelism here is axis
assignment on one jax.sharding.Mesh).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ParallelismConfig:
    """Mesh axis sizes (reference training_args.py:1282 parallelism_config,
    compiled here to one Mesh with axes data/fsdp/sequence/tensor).

    ``cp_size`` is context parallelism: the Trainer shards every sequence-dim
    input buffer over the ``sequence`` mesh axis (the GSPMD analog of the
    reference's ``_prepare_context_parallel_inputs``, trainer.py:2235 — XLA
    inserts the attention collectives instead of torch's ring hooks)."""

    dp_size: int = 1
    fsdp_size: int = 1
    tp_size: int = 1
    cp_size: int = 1

    def total(self) -> int:
        return self.dp_size * self.fsdp_size * self.tp_size * self.cp_size


@dataclass
class TrainingArguments:
    output_dir: str = "trainer_output"
    overwrite_output_dir: bool = False

    # batch / steps
    per_device_train_batch_size: int = 8
    per_device_eval_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    num_train_epochs: float = 3.0
    max_steps: int = -1

    # optimizer
    learning_rate: float = 5e-5
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    optim: str = "adamw"

    # scheduler
    lr_scheduler_type: str = "linear"
    lr_scheduler_kwargs: Optional[dict] = None
    warmup_steps: int = 0
    warmup_ratio: float = 0.0

    # logging / eval / save
    logging_steps: int = 500
    logging_first_step: bool = False
    eval_strategy: str = "no"  # no | steps | epoch
    eval_steps: Optional[int] = None
    save_strategy: str = "steps"  # no | steps | epoch
    save_steps: int = 500
    save_total_limit: Optional[int] = None
    report_to: Optional[list] = None

    # numerics
    seed: int = 42
    bf16: bool = False
    # parallelism
    parallelism_config: Optional[ParallelismConfig] = None

    # misc
    dataloader_drop_last: bool = True
    label_names: Optional[list] = None
    remove_unused_columns: bool = True
    resume_from_checkpoint: Optional[str] = None
    disable_tqdm: bool = True

    def __post_init__(self):
        if isinstance(self.parallelism_config, dict):
            self.parallelism_config = ParallelismConfig(**self.parallelism_config)

    @property
    def train_batch_size(self) -> int:
        import jax

        n = len(jax.devices())
        return self.per_device_train_batch_size * n

    @property
    def eval_batch_size(self) -> int:
        import jax

        return self.per_device_eval_batch_size * len(jax.devices())

    def get_warmup_steps(self, num_training_steps: int) -> int:
        if self.warmup_steps > 0:
            return self.warmup_steps
        return int(num_training_steps * self.warmup_ratio)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True, default=str)
