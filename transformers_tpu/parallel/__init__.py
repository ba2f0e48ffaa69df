from .mesh import DATA_AXIS, EXPERT_AXIS, FSDP_AXIS, SEQUENCE_AXIS, TENSOR_AXIS, default_mesh, make_mesh
from .plans import (
    load_shardings_from_plan,
    param_specs_with_plan,
    shard_params_with_plan,
    spec_for_param,
)
