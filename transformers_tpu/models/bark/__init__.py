from .configuration_bark import (
    BarkCoarseConfig,
    BarkCoarseGenerationConfig,
    BarkConfig,
    BarkFineConfig,
    BarkFineGenerationConfig,
    BarkSemanticConfig,
    BarkSemanticGenerationConfig,
)
from .modeling_bark import (
    BarkCausalModel,
    BarkCoarseModel,
    BarkFineModel,
    BarkModel,
    BarkSemanticModel,
)
from .processing_bark import BarkProcessor
