from .configuration_vaultgemma import VaultGemmaConfig
from .modeling_vaultgemma import (VaultGemmaForCausalLM, VaultGemmaModel,
                                  VaultGemmaModelStandalone)
