from .modeling_lfm2 import (Lfm2Config, Lfm2ForCausalLM, Lfm2Model,
                            Lfm2ModelStandalone)
