from .tokenization_myt5 import MyT5Tokenizer
