from .tokenization_byt5 import ByT5Tokenizer
