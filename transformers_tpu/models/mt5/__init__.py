from .modeling_mt5 import MT5Config, MT5EncoderModel, MT5ForConditionalGeneration
