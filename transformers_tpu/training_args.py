"""TrainingArguments.

TPU-native analog of reference src/transformers/training_args.py (the
load-bearing ~45 of its ~180 fields, plus mesh-based ``parallelism_config``
replacing accelerate's — SURVEY §2.8: all parallelism here is axis
assignment on one jax.sharding.Mesh). Knobs that only exist because of
torch runtime mechanics (pin_memory, ddp_*, deepspeed, torch_compile
backends) are deliberately absent: under jit everything is one compiled
program and the mesh covers distribution.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional

from .utils import logging

logger = logging.get_logger(__name__)


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
    # Ulysses sequence parallelism (reference trainer.py:2267 sp_backend):
    # same sequence-axis input sharding as cp, but attention re-shards
    # HEAD-wise via all-to-all (attn impl "ulysses") instead of ring/GSPMD
    # collectives over the kv sequence. Mutually exclusive with cp_size.
    sp_size: int = 1

    def __post_init__(self):
        if self.cp_size > 1 and self.sp_size > 1:
            raise ValueError(
                "cp_size and sp_size both shard the sequence axis — set one.")

    def total(self) -> int:
        return (self.dp_size * self.fsdp_size * self.tp_size * self.cp_size
                * self.sp_size)


@dataclass
class TrainingArguments:
    """reference training_args.py:174 (field-for-field where applicable)."""

    output_dir: str = "trainer_output"
    overwrite_output_dir: bool = False

    # top-level intent flags (consumed by example scripts / HfArgumentParser)
    do_train: bool = False
    do_eval: bool = False
    do_predict: bool = False

    # batch / steps
    per_device_train_batch_size: int = 8
    per_device_eval_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    eval_accumulation_steps: Optional[int] = None
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
    optim_args: Optional[str] = None

    # scheduler
    lr_scheduler_type: str = "linear"
    lr_scheduler_kwargs: Optional[dict] = None
    warmup_steps: int = 0
    warmup_ratio: float = 0.0

    # loss shaping
    label_smoothing_factor: float = 0.0

    # memory
    gradient_checkpointing: bool = False
    gradient_checkpointing_kwargs: Optional[dict] = None

    # logging / eval / save
    logging_strategy: str = "steps"  # no | steps | epoch
    logging_dir: Optional[str] = None
    logging_steps: int = 500
    logging_first_step: bool = False
    logging_nan_inf_filter: bool = True
    eval_strategy: str = "no"  # no | steps | epoch
    eval_steps: Optional[int] = None
    eval_delay: float = 0
    prediction_loss_only: bool = False
    save_strategy: str = "steps"  # no | steps | epoch
    save_steps: int = 500
    save_total_limit: Optional[int] = None
    save_safetensors: bool = True
    save_only_model: bool = False
    load_best_model_at_end: bool = False
    metric_for_best_model: Optional[str] = None
    greater_is_better: Optional[bool] = None
    report_to: Optional[list] = None
    run_name: Optional[str] = None

    # numerics
    seed: int = 42
    data_seed: Optional[int] = None
    bf16: bool = False
    fp16: bool = False  # TPU MXU has no fp16 path; mapped to bf16 with a warning

    # parallelism
    parallelism_config: Optional[ParallelismConfig] = None

    # dataloader
    dataloader_drop_last: bool = True
    dataloader_num_workers: int = 0  # host loader is synchronous; API parity
    group_by_length: bool = False
    length_column_name: str = "length"

    # misc
    label_names: Optional[list] = None
    remove_unused_columns: bool = True
    resume_from_checkpoint: Optional[str] = None
    ignore_data_skip: bool = False
    include_num_input_tokens_seen: bool = False
    average_tokens_across_devices: bool = True  # GSPMD global mean is native
    torch_compile: bool = False  # no-op: every step is jit-compiled already
    disable_tqdm: bool = True

    # ---- additional commonly-used reference fields (training_args.py:174)
    # NEFTune embedding noise during training (reference trainer.py
    # _activate_neftune; implemented in the jitted train step)
    neftune_noise_alpha: Optional[float] = None
    # run evaluation once before the first training step
    eval_on_start: bool = False
    # hub publishing intent (reference push_to_hub family; consumed by
    # user scripts via PushToHubMixin — accepted and surfaced, no egress here)
    push_to_hub: bool = False
    hub_model_id: Optional[str] = None
    hub_strategy: str = "every_save"
    hub_private_repo: Optional[bool] = None
    hub_always_push: bool = False
    # logging/eval depth
    log_level: str = "passive"
    logging_nan_inf_grad_filter: bool = False
    include_tokens_per_second: bool = False
    include_for_metrics: list = field(default_factory=list)
    batch_eval_metrics: bool = False
    # determinism / debug
    full_determinism: bool = False
    debug: str = ""
    # dataloader extras
    dataloader_pin_memory: bool = True   # host-side no-op under jax
    dataloader_persistent_workers: bool = False
    dataloader_prefetch_factor: Optional[int] = None
    # legacy/compat knobs accepted for argparse parity
    use_cpu: bool = False
    jit_mode_eval: bool = False
    auto_find_batch_size: bool = False
    past_index: int = -1
    label_smoothing: Optional[float] = None  # alias of label_smoothing_factor

    def __post_init__(self):
        if self.deepspeed:
            raise ValueError(
                "deepspeed is a torch/ZeRO runtime knob; on TPU sharded "
                "training rides the GSPMD mesh — set dp/fsdp/tp/cp/sp sizes "
                "instead (training_args dp_size/fsdp_size/...).")
        if self.fsdp and self.parallelism_config is None:
            # honor the torch-style flag as a mesh hint: fsdp over all devices
            import jax as _jax

            self.parallelism_config = ParallelismConfig(
                fsdp_size=len(_jax.devices()))
        if isinstance(self.parallelism_config, dict):
            self.parallelism_config = ParallelismConfig(**self.parallelism_config)
        if self.fp16:
            logger.warning("fp16 requested; TPUs compute in bfloat16 — using bf16")
            self.bf16, self.fp16 = True, False
        if self.label_smoothing is not None:
            self.label_smoothing_factor = self.label_smoothing
        if self.logging_dir is None:
            self.logging_dir = os.path.join(self.output_dir, "runs")
        if self.load_best_model_at_end:
            if self.metric_for_best_model is None:
                self.metric_for_best_model = "loss"
            if self.eval_strategy == "no":
                raise ValueError(
                    "load_best_model_at_end requires eval_strategy of 'steps' or 'epoch'")
        if self.greater_is_better is None and self.metric_for_best_model is not None:
            self.greater_is_better = not self.metric_for_best_model.rstrip().endswith("loss")
        for name, value in (("logging_strategy", self.logging_strategy),
                            ("eval_strategy", self.eval_strategy),
                            ("save_strategy", self.save_strategy)):
            if value not in ("no", "steps", "epoch"):
                raise ValueError(f"{name} must be one of no|steps|epoch, got {value!r}")

    # ---- r5 surface completion (reference training_args.py; TPU semantics
    # noted per field — distributed-backend fields validate/no-op where the
    # GSPMD mesh replaces torch DDP/FSDP/DeepSpeed wiring)
    bf16_full_eval: bool = False          # eval in bf16 even when train fp32
    fp16_full_eval: bool = False          # alias tier: fp16≡bf16 on TPU
    tf32: Optional[bool] = None           # validated no-op: MXU is bf16-native
    local_rank: int = -1                  # single-controller JAX: always -1
    log_on_each_node: bool = True
    log_level_replica: str = "warning"
    save_on_each_node: bool = False
    skip_memory_metrics: bool = True
    use_cache: Optional[bool] = None      # forwarded to model.config.use_cache
    eval_do_concat_batches: bool = True
    eval_use_gather_object: bool = False
    restore_callback_states_from_checkpoint: bool = False
    enable_jit_checkpoint: bool = False   # SIGTERM JIT checkpoint (we default via trainer)
    torch_empty_cache_steps: Optional[int] = None  # validated no-op (XLA arena)
    torch_compile_backend: Optional[str] = None    # validated no-op (always XLA)
    torch_compile_mode: Optional[str] = None
    ddp_backend: Optional[str] = None     # validated no-op: ICI/DCN collectives
    ddp_timeout: int = 1800
    ddp_find_unused_parameters: Optional[bool] = None
    ddp_broadcast_buffers: Optional[bool] = None
    ddp_bucket_cap_mb: Optional[int] = None
    ddp_static_graph: bool = False
    fsdp: str = ""                        # torch-style FSDP flag -> fsdp_size hint
    fsdp_config: Optional[dict] = None
    deepspeed: Optional[str] = None       # rejected: GSPMD replaces ZeRO
    accelerator_config: Optional[dict] = None
    dataloader_in_order: bool = True
    dataloader_multiprocessing_context: Optional[str] = None
    train_sampling_strategy: str = "random"
    optim_target_modules: Optional[list] = None
    use_liger_kernel: bool = False        # validated no-op: in-tree Pallas kernels
    liger_kernel_config: Optional[dict] = None
    hub_token: Optional[str] = None
    hub_revision: Optional[str] = None
    project: Optional[str] = None         # trackio-style project name
    trackio_space_id: Optional[str] = None
    trackio_static_space_id: Optional[str] = None
    trackio_bucket_id: Optional[str] = None

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
