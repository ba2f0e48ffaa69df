"""AutoImageProcessor (reference models/auto/image_processing_auto.py)."""

from __future__ import annotations

import importlib
import json

from ...image_processing_utils import IMAGE_PROCESSOR_NAME, BaseImageProcessor
from ...utils.hub import cached_file

# model_type -> (module, class). Aliases follow the reference's
# models/auto/image_processing_auto.py routing (e.g. resnet/regnet/cvt ->
# ConvNext crop_pct semantics, dinov2/focalnet/hiera -> BiT, swin-family ->
# ViT) so the per-family preprocessing semantics are preserved.
IMAGE_PROCESSOR_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "vit": ("vit", "ViTImageProcessor"),
    "clip": ("clip", "CLIPImageProcessor"),
    "siglip": ("siglip", "SiglipImageProcessor"),
    "llava": ("clip", "CLIPImageProcessor"),
    "qwen2_vl": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "detr": ("detr", "DetrImageProcessor"),
    "blip": ("blip", "BlipImageProcessor"),
    "sam": ("sam", "SamImageProcessor"),
    "superglue": ("superglue", "SuperGlueImageProcessor"),
    # ConvNext crop_pct family
    "convnext": ("convnext", "ConvNextImageProcessor"),
    "convnextv2": ("convnext", "ConvNextV2ImageProcessor"),
    "resnet": ("convnext", "ConvNextImageProcessor"),
    "regnet": ("convnext", "ConvNextImageProcessor"),
    "cvt": ("convnext", "ConvNextImageProcessor"),
    # BiT family
    "bit": ("bit", "BitImageProcessor"),
    "dinov2": ("bit", "BitImageProcessor"),
    "focalnet": ("bit", "BitImageProcessor"),
    "hiera": ("bit", "BitImageProcessor"),
    # ViT-default family
    "deit": ("deit", "DeiTImageProcessor"),
    "swin": ("vit", "ViTImageProcessor"),
    "swinv2": ("vit", "ViTImageProcessor"),
    "swiftformer": ("vit", "ViTImageProcessor"),
    "dinat": ("vit", "ViTImageProcessor"),
    "ijepa": ("vit", "ViTImageProcessor"),
    "vit_mae": ("vit", "ViTImageProcessor"),
    "vit_msn": ("vit", "ViTImageProcessor"),
    "mgp-str": ("vit", "ViTImageProcessor"),
    "trocr": ("vit", "ViTImageProcessor"),
    "clipseg": ("clip", "CLIPImageProcessor"),
    # segmentation tier
    "segformer": ("segformer", "SegformerImageProcessor"),
    "upernet": ("segformer", "SegformerImageProcessor"),
    "beit": ("beit", "BeitImageProcessor"),
    "data2vec-vision": ("beit", "BeitImageProcessor"),
    "mobilevit": ("mobilevit", "MobileViTImageProcessor"),
    "mobilevitv2": ("mobilevit", "MobileViTImageProcessor"),
    "mobilenet_v1": ("mobilenet_v2", "MobileNetV1ImageProcessor"),
    "mobilenet_v2": ("mobilenet_v2", "MobileNetV2ImageProcessor"),
    # depth tier
    "dpt": ("dpt", "DPTImageProcessor"),
    "depth_anything": ("dpt", "DPTImageProcessor"),
    "glpn": ("glpn", "GLPNImageProcessor"),
    # detection tier
    "yolos": ("detr", "DetrImageProcessor"),
    "table-transformer": ("detr", "DetrImageProcessor"),
    "owlvit": ("owlvit", "OwlViTImageProcessor"),
    "owlv2": ("owlv2", "Owlv2ImageProcessor"),
    # document tier
    "donut-swin": ("donut", "DonutImageProcessor"),
    "nougat": ("donut", "NougatImageProcessor"),
    # classification long tail
    "poolformer": ("poolformer", "PoolFormerImageProcessor"),
    "efficientnet": ("efficientnet", "EfficientNetImageProcessor"),
    "align": ("efficientnet", "EfficientNetImageProcessor"),
    "levit": ("levit", "LevitImageProcessor"),
    "pvt": ("pvt", "PvtImageProcessor"),
    "pvt_v2": ("pvt", "PvtImageProcessor"),
    "textnet": ("textnet", "TextNetImageProcessor"),
    "chameleon": ("chameleon", "ChameleonImageProcessor"),
    "imagegpt": ("imagegpt", "ImageGPTImageProcessor"),
    "vilt": ("vilt", "ViltImageProcessor"),
    "superpoint": ("superpoint", "SuperPointImageProcessor"),
    # video tier
    "videomae": ("videomae", "VideoMAEImageProcessor"),
    "timesformer": ("videomae", "VideoMAEImageProcessor"),
    "vivit": ("videomae", "VivitImageProcessor"),
    # CLIP-stat dual encoders
    "chinese_clip": ("bit", "BitImageProcessor"),
    "aimv2": ("clip", "CLIPImageProcessor"),
    "altclip": ("clip", "CLIPImageProcessor"),
    "metaclip_2": ("clip", "CLIPImageProcessor"),
    "groupvit": ("clip", "CLIPImageProcessor"),
    "xclip": ("clip", "CLIPImageProcessor"),
    "git": ("clip", "CLIPImageProcessor"),
    "kosmos-2": ("clip", "CLIPImageProcessor"),
    "vipllava": ("clip", "CLIPImageProcessor"),
    "florence2": ("clip", "CLIPImageProcessor"),
    # siglip consumers
    "colpali": ("siglip", "SiglipImageProcessor"),
    "paligemma": ("siglip", "SiglipImageProcessor"),
    "gemma3n": ("siglip", "SiglipImageProcessor"),
    # qwen2-vl consumers
    "qwen2_5_vl": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "qwen3_vl": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "qwen3_vl_moe": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "colqwen2": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "blip-2": ("blip", "BlipImageProcessor"),
    "instructblip": ("blip", "BlipImageProcessor"),
    "sam2": ("sam", "SamImageProcessor"),
    "sam_hq": ("sam", "SamImageProcessor"),
    "gemma3": ("gemma3", "Gemma3ImageProcessor"),
    "shieldgemma2": ("gemma3", "Gemma3ImageProcessor"),
    "swin2sr": ("swin2sr", "Swin2SRImageProcessor"),
    "idefics": ("idefics", "IdeficsImageProcessor"),
    "grounding-dino": ("grounding_dino", "GroundingDinoImageProcessor"),
    "mm-grounding-dino": ("grounding_dino", "GroundingDinoImageProcessor"),
    "kosmos-2.5": ("kosmos2_5", "Kosmos2_5ImageProcessor"),
    "video_llava": ("clip", "CLIPImageProcessor"),
    "llava_next": ("llava_next", "LlavaNextImageProcessor"),
    "llava_next_video": ("llava_next", "LlavaNextImageProcessor"),
    "llava_onevision": ("llava_next", "LlavaNextImageProcessor"),
    "pixtral": ("pixtral", "PixtralImageProcessor"),
    "mistral3": ("pixtral", "PixtralImageProcessor"),
    "idefics3": ("idefics3", "Idefics3ImageProcessor"),
    "smolvlm": ("idefics3", "Idefics3ImageProcessor"),
    "mllama": ("mllama", "MllamaImageProcessor"),
    # r5 processor sweep
    "got_ocr2": ("got_ocr2", "GotOcr2ImageProcessor"),
    "internvl": ("got_ocr2", "GotOcr2ImageProcessor"),
    "aya_vision": ("got_ocr2", "GotOcr2ImageProcessor"),
    "llama4": ("got_ocr2", "GotOcr2ImageProcessor"),
    "idefics2": ("idefics2", "Idefics2ImageProcessor"),
    "emu3": ("emu3", "Emu3ImageProcessor"),
    "fuyu": ("fuyu", "FuyuImageProcessor"),
    "bridgetower": ("bridgetower", "BridgeTowerImageProcessor"),
    "flava": ("clip", "CLIPImageProcessor"),
    "glm4v": ("qwen2_vl", "Qwen2VLImageProcessor"),
    "deepseek_vl": ("clip", "CLIPImageProcessor"),
    "gemma3n": ("siglip", "SiglipImageProcessor"),
    "x_clip": ("clip", "CLIPImageProcessor"),
    "pix2struct": ("pix2struct", "Pix2StructImageProcessor"),
    # detection/segmentation long tail (meta-test closure)
    "conditional_detr": ("detr", "DetrImageProcessor"),
    "dab-detr": ("detr", "DetrImageProcessor"),
    "deformable_detr": ("detr", "DetrImageProcessor"),
    "maskformer": ("detr", "DetrImageProcessor"),
    "mask2former": ("detr", "DetrImageProcessor"),
    "rt_detr": ("rt_detr", "RTDetrImageProcessor"),
    "rt_detr_resnet": ("rt_detr", "RTDetrImageProcessor"),
    "d_fine": ("rt_detr", "RTDetrImageProcessor"),
    "vitmatte": ("vitmatte", "VitMatteImageProcessor"),
    "seggpt": ("vit", "ViTImageProcessor"),
    "vitdet": ("vit", "ViTImageProcessor"),
    "perceiver": ("vit", "ViTImageProcessor"),
    "zoedepth": ("dpt", "DPTImageProcessor"),
    "dinov3_vit": ("bit", "BitImageProcessor"),
    "dinov3_convnext": ("convnext", "ConvNextImageProcessor"),
    "siglip2": ("siglip", "SiglipImageProcessor"),
}

# image_processor_type class-name -> (module, class): derived from the
# model_type mapping (every target class resolves by its own name, plus the
# reference's "Fast"/"Pil" backend-suffixed aliases).
_CLASS_NAMES: dict[str, tuple[str, str]] = {}
for _mod, _cls in IMAGE_PROCESSOR_MAPPING_NAMES.values():
    for _suffix in ("", "Fast", "Pil"):
        _CLASS_NAMES.setdefault(_cls + _suffix, (_mod, _cls))
_CLASS_NAMES.update({
    "SuperPointImageProcessor": ("superpoint", "SuperPointImageProcessor"),
    "SuperPointImageProcessorFast": ("superpoint", "SuperPointImageProcessor"),
    "ConvNextV2ImageProcessor": ("convnext", "ConvNextV2ImageProcessor"),
    "NougatImageProcessor": ("donut", "NougatImageProcessor"),
    "NougatImageProcessorFast": ("donut", "NougatImageProcessor"),
    "VivitImageProcessor": ("videomae", "VivitImageProcessor"),
    "YolosImageProcessor": ("detr", "DetrImageProcessor"),
    "YolosImageProcessorFast": ("detr", "DetrImageProcessor"),
    "ChineseCLIPImageProcessor": ("bit", "BitImageProcessor"),
    "ChineseCLIPImageProcessorFast": ("bit", "BitImageProcessor"),
    "EfficientNetImageProcessor": ("efficientnet", "EfficientNetImageProcessor"),
    "MobileNetV1ImageProcessor": ("mobilenet_v2", "MobileNetV1ImageProcessor"),
    "PvtImageProcessor": ("pvt", "PvtImageProcessor"),
    "Owlv2ImageProcessor": ("owlv2", "Owlv2ImageProcessor"),
    "Owlv2ImageProcessorFast": ("owlv2", "Owlv2ImageProcessor"),
})


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
