from . import auto, llama
