from .modeling_flaubert import (FlaubertConfig, FlaubertModel,
                                FlaubertModelStandalone,
                                FlaubertWithLMHeadModel)
