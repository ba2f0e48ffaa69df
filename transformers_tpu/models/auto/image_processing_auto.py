"""AutoImageProcessor (reference models/auto/image_processing_auto.py)."""

from __future__ import annotations

import importlib
import json

from ...image_processing_utils import IMAGE_PROCESSOR_NAME, BaseImageProcessor
from ...utils.hub import cached_file

# model_type -> (module, class)
IMAGE_PROCESSOR_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "vit": ("vit", "ViTImageProcessor"),
    "clip": ("clip", "CLIPImageProcessor"),
    "siglip": ("siglip", "SiglipImageProcessor"),
    "llava": ("clip", "CLIPImageProcessor"),
    "qwen2_vl": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "detr": ("detr", "DetrImageProcessor"),
    "resnet": ("vit", "ViTImageProcessor"),
    "convnext": ("vit", "ViTImageProcessor"),
    "segformer": ("vit", "ViTImageProcessor"),
    "glpn": ("vit", "ViTImageProcessor"),
    "owlvit": ("clip", "CLIPImageProcessor"),
    "blip": ("blip", "BlipImageProcessor"),
    "sam": ("sam", "SamImageProcessor"),
    "superglue": ("superglue", "SuperGlueImageProcessor"),
    "deit": ("vit", "ViTImageProcessor"),
    "dinov2": ("vit", "ViTImageProcessor"),
    "swin": ("vit", "ViTImageProcessor"),
    "convnextv2": ("vit", "ViTImageProcessor"),
}

# image_processor_type class-name -> (module, class)
_CLASS_NAMES = {
    "ViTImageProcessor": ("vit", "ViTImageProcessor"),
    "ViTImageProcessorFast": ("vit", "ViTImageProcessor"),
    "CLIPImageProcessor": ("clip", "CLIPImageProcessor"),
    "CLIPImageProcessorFast": ("clip", "CLIPImageProcessor"),
    "SiglipImageProcessor": ("siglip", "SiglipImageProcessor"),
    "SiglipImageProcessorFast": ("siglip", "SiglipImageProcessor"),
    "Qwen2VLImageProcessor": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "Qwen2VLImageProcessorFast": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "DetrImageProcessor": ("detr", "DetrImageProcessor"),
    "DetrImageProcessorFast": ("detr", "DetrImageProcessor"),
    "ConvNextImageProcessor": ("vit", "ViTImageProcessor"),
    "SegformerImageProcessor": ("vit", "ViTImageProcessor"),
    "SegformerImageProcessorFast": ("vit", "ViTImageProcessor"),
    "GLPNImageProcessor": ("vit", "ViTImageProcessor"),
    "GLPNImageProcessorFast": ("vit", "ViTImageProcessor"),
    "OwlViTImageProcessor": ("clip", "CLIPImageProcessor"),
    "OwlViTImageProcessorFast": ("clip", "CLIPImageProcessor"),
    "BlipImageProcessor": ("blip", "BlipImageProcessor"),
    "BlipImageProcessorFast": ("blip", "BlipImageProcessor"),
    "SamImageProcessor": ("sam", "SamImageProcessor"),
    "SuperGlueImageProcessor": ("superglue", "SuperGlueImageProcessor"),
    "SuperPointImageProcessor": ("superglue", "SuperGlueImageProcessor"),
    "SamImageProcessorFast": ("sam", "SamImageProcessor"),
    "DeiTImageProcessor": ("vit", "ViTImageProcessor"),
    "DeiTImageProcessorFast": ("vit", "ViTImageProcessor"),
    "BitImageProcessor": ("vit", "ViTImageProcessor"),
    "BitImageProcessorFast": ("vit", "ViTImageProcessor"),
    "ConvNextV2ImageProcessor": ("vit", "ViTImageProcessor"),
}


def _load(module_name: str, class_name: str):
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    return getattr(module, class_name)


class AutoImageProcessor:
    def __init__(self):
        raise OSError("Use AutoImageProcessor.from_pretrained.")

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> BaseImageProcessor:
        resolved = cached_file(str(pretrained_model_name_or_path), IMAGE_PROCESSOR_NAME)
        with open(resolved, encoding="utf-8") as f:
            config = json.load(f)
        type_name = config.get("image_processor_type")
        if type_name in _CLASS_NAMES:
            proc_cls = _load(*_CLASS_NAMES[type_name])
        else:
            # fall back to the model_type route via config.json
            from .configuration_auto import AutoConfig

            model_config = AutoConfig.from_pretrained(pretrained_model_name_or_path)
            key = model_config.model_type
            if key not in IMAGE_PROCESSOR_MAPPING_NAMES:
                raise KeyError(f"No image processor registered for {type_name!r} / {key!r}")
            proc_cls = _load(*IMAGE_PROCESSOR_MAPPING_NAMES[key])
        config.update(kwargs)
        return proc_cls(**config)

    @staticmethod
    def register(model_type: str, proc_cls) -> None:
        module = proc_cls.__module__.rsplit(".", 2)[-2]
        IMAGE_PROCESSOR_MAPPING_NAMES[model_type] = (module, proc_cls.__name__)
        _CLASS_NAMES[proc_cls.__name__] = (module, proc_cls.__name__)
