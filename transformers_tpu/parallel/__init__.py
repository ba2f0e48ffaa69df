from .mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    FSDP_AXIS,
    PIPELINE_AXIS,
    SEQUENCE_AXIS,
    TENSOR_AXIS,
    default_mesh,
    make_mesh,
)
from .pipeline import (
    pipeline_forward,
    pipeline_param_specs,
    shard_stacked_params,
    stack_layer_params,
    unstack_layer_params,
)
from .plans import (
    load_shardings_from_plan,
    param_specs_with_plan,
    shard_params_with_plan,
    spec_for_param,
)
from .ulysses import make_ulysses_attention, ulysses_attention_sharded  # noqa: F401
