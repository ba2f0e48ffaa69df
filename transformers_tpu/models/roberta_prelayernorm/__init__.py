from .modeling_roberta_prelayernorm import (RobertaPreLayerNormConfig,
                                            RobertaPreLayerNormForMaskedLM,
                                            RobertaPreLayerNormModel,
                                            RobertaPreLayerNormModelStandalone)
