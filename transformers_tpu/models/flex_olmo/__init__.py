from .configuration_flex_olmo import FlexOlmoConfig
from .modeling_flex_olmo import (FlexOlmoForCausalLM, FlexOlmoModel,
                                 FlexOlmoModelStandalone)
