from .configuration_granitemoeshared import GraniteMoeSharedConfig
from .modeling_granitemoeshared import (GraniteMoeSharedForCausalLM,
                                        GraniteMoeSharedModel,
                                        GraniteMoeSharedModelStandalone)
