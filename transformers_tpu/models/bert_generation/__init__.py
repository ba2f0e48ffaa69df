from .modeling_bert_generation import (BertGenerationConfig,
                                       BertGenerationDecoder,
                                       BertGenerationEncoder)
