from .module import Conv, Embedding, LayerNorm, Linear, Module, ModuleList, RMSNorm
from .safetensors import SafetensorsFile, load_file, safe_open, save_file
