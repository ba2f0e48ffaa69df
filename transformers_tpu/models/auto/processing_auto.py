"""AutoProcessor (reference models/auto/processing_auto.py)."""

from __future__ import annotations

import importlib
import json

from ...processing_utils import PROCESSOR_NAME, ProcessorMixin
from ...utils.hub import cached_file

PROCESSOR_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "llava": ("llava", "LlavaProcessor"),
    "clip": ("clip", "CLIPProcessor"),
    "blip": ("blip", "BlipProcessor"),
    "siglip": ("siglip", "SiglipProcessor"),
    "whisper": ("whisper", "WhisperProcessor"),
    "qwen2_vl": ("qwen2_vl", "Qwen2VLProcessor"),
    "qwen2_5_vl": ("qwen2_vl", "Qwen2VLProcessor"),
    "gemma3": ("gemma3", "Gemma3Processor"),
    "shieldgemma2": ("shieldgemma2", "ShieldGemma2Processor"),
    "grounding-dino": ("grounding_dino", "GroundingDinoProcessor"),
    "mm-grounding-dino": ("grounding_dino", "GroundingDinoProcessor"),
    "kosmos-2.5": ("kosmos2_5", "Kosmos2_5Processor"),
    "video_llava": ("video_llava", "VideoLlavaProcessor"),
    "qwen2_5_omni": ("qwen2_5_omni", "Qwen2_5OmniProcessor"),
    "blip-2": ("blip_2", "Blip2Processor"),
    "paligemma": ("paligemma", "PaliGemmaProcessor"),
    "llava_next": ("llava_next", "LlavaNextProcessor"),
    "pixtral": ("pixtral", "PixtralProcessor"),
    "idefics3": ("idefics3", "Idefics3Processor"),
    "mllama": ("mllama", "MllamaProcessor"),
    # dual encoders / retrieval
    "align": ("align", "AlignProcessor"),
    "altclip": ("altclip", "AltCLIPProcessor"),
    "chinese_clip": ("chinese_clip", "ChineseCLIPProcessor"),
    "xclip": ("x_clip", "XCLIPProcessor"),
    "flava": ("flava", "FlavaProcessor"),
    "bridgetower": ("bridgetower", "BridgeTowerProcessor"),
    "vision-text-dual-encoder": ("vision_text_dual_encoder",
                                 "VisionTextDualEncoderProcessor"),
    # captioning / VQA
    "git": ("git", "GitProcessor"),
    "vilt": ("vilt", "ViltProcessor"),
    # detection / segmentation
    "owlvit": ("owlvit", "OwlViTProcessor"),
    "owlv2": ("owlv2", "Owlv2Processor"),
    "clipseg": ("clipseg", "CLIPSegProcessor"),
    # OCR / document
    "donut-swin": ("donut", "DonutProcessor"),
    "nougat": ("nougat", "NougatProcessor"),
    "trocr": ("trocr", "TrOCRProcessor"),
    "mgp-str": ("mgp_str", "MgpstrProcessor"),
    "got_ocr2": ("got_ocr2", "GotOcr2Processor"),
    # VLM expansion tier
    "chameleon": ("chameleon", "ChameleonProcessor"),
    "deepseek_vl": ("deepseek_vl", "DeepseekVLProcessor"),
    "deepseek_vl_hybrid": ("deepseek_vl", "DeepseekVLProcessor"),
    "instructblip": ("instructblip", "InstructBlipProcessor"),
    "kosmos-2": ("kosmos2", "Kosmos2Processor"),
    "internvl": ("internvl", "InternVLProcessor"),
    "aya_vision": ("aya_vision", "AyaVisionProcessor"),
    "gemma3n": ("gemma3n", "Gemma3nProcessor"),
    "glm4v": ("glm4v", "Glm4vProcessor"),
    "qwen3_vl": ("qwen3_vl", "Qwen3VLProcessor"),
    "qwen3_vl_moe": ("qwen3_vl", "Qwen3VLProcessor"),
    "smolvlm": ("smolvlm", "SmolVLMProcessor"),
    "idefics2": ("idefics2", "Idefics2Processor"),
    "llava_onevision": ("llava_onevision", "LlavaOnevisionProcessor"),
    "llava_next_video": ("llava_next_video", "LlavaNextVideoProcessor"),
    "colpali": ("colpali", "ColPaliProcessor"),
    "colqwen2": ("colqwen2", "ColQwen2Processor"),
    "llama4": ("llama4", "Llama4Processor"),
    "emu3": ("emu3", "Emu3Processor"),
    "fuyu": ("fuyu", "FuyuProcessor"),
    # audio tier
    "clap": ("clap", "ClapProcessor"),
    "wav2vec2": ("wav2vec2", "Wav2Vec2Processor"),
    "wav2vec2-bert": ("wav2vec2_bert", "Wav2Vec2BertProcessor"),
    "speech_to_text": ("speech_to_text", "Speech2TextProcessor"),
    "speecht5": ("speecht5", "SpeechT5Processor"),
    "musicgen": ("musicgen", "MusicgenProcessor"),
    "musicgen_melody": ("musicgen_melody", "MusicgenMelodyProcessor"),
    "seamless_m4t": ("seamless_m4t", "SeamlessM4TProcessor"),
    "qwen2_audio": ("qwen2_audio", "Qwen2AudioProcessor"),
    "voxtral": ("voxtral", "VoxtralProcessor"),
    "parakeet_ctc": ("parakeet", "ParakeetProcessor"),
    "parakeet_rnnt": ("parakeet", "ParakeetProcessor"),
    "parakeet_tdt": ("parakeet", "ParakeetProcessor"),
    # layout / document / prompt tier
    "layoutlmv3": ("layoutlmv3", "LayoutLMv3Processor"),
    "layoutxlm": ("layoutxlm", "LayoutXLMProcessor"),
    "bros": ("bros", "BrosProcessor"),
    "udop": ("udop", "UdopProcessor"),
    "markuplm": ("markuplm", "MarkupLMProcessor"),
    "pix2struct": ("pix2struct", "Pix2StructProcessor"),
    "sam": ("sam", "SamProcessor"),
    "sam2": ("sam2", "Sam2Processor"),
    "sam_hq": ("sam", "SamProcessor"),
    "bark": ("bark", "BarkProcessor"),
}

# processor_class name -> (module, class): derived — every registered class
# resolves by its own name; extra aliases for reference names that map onto a
# shared implementation here.
_CLASS_NAMES: dict[str, tuple[str, str]] = {
    mod_cls[1]: mod_cls for mod_cls in PROCESSOR_MAPPING_NAMES.values()
}
_CLASS_NAMES["Qwen2_5_VLProcessor"] = ("qwen2_vl", "Qwen2VLProcessor")


class AutoProcessor:
    def __init__(self):
        raise OSError("Use AutoProcessor.from_pretrained.")

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> ProcessorMixin:
        proc_cls = None
        resolved = cached_file(str(pretrained_model_name_or_path), PROCESSOR_NAME,
                               _raise_exceptions_for_missing_entries=False)
        if resolved:
            with open(resolved, encoding="utf-8") as f:
                name = json.load(f).get("processor_class")
            if name in _CLASS_NAMES:
                module, cname = _CLASS_NAMES[name]
                proc_cls = getattr(importlib.import_module(f"transformers_tpu.models.{module}"), cname)
        if proc_cls is None:
            from .configuration_auto import AutoConfig

            config = AutoConfig.from_pretrained(pretrained_model_name_or_path)
            if config.model_type in PROCESSOR_MAPPING_NAMES:
                module, cname = PROCESSOR_MAPPING_NAMES[config.model_type]
                proc_cls = getattr(importlib.import_module(f"transformers_tpu.models.{module}"), cname)
            else:
                # reference fallback chain (models/auto/processing_auto.py:
                # 353-386): families without a composite processor resolve
                # their single preprocessing class — image processor, then
                # feature extractor, then tokenizer
                from .image_processing_auto import (
                    IMAGE_PROCESSOR_MAPPING_NAMES,
                    AutoImageProcessor,
                )

                if config.model_type in IMAGE_PROCESSOR_MAPPING_NAMES:
                    return AutoImageProcessor.from_pretrained(
                        pretrained_model_name_or_path, **kwargs)
                try:
                    from ...feature_extraction_utils import AutoFeatureExtractor

                    return AutoFeatureExtractor.from_pretrained(
                        pretrained_model_name_or_path, **kwargs)
                except Exception:  # noqa: BLE001 — no preprocessor config
                    pass
                try:
                    from ...tokenization import AutoTokenizer

                    return AutoTokenizer.from_pretrained(
                        pretrained_model_name_or_path, **kwargs)
                except Exception as e:  # noqa: BLE001
                    raise KeyError(
                        f"No processor registered for model_type {config.model_type!r}"
                    ) from e
        return proc_cls.from_pretrained(pretrained_model_name_or_path, **kwargs)

    @staticmethod
    def register(model_type: str, proc_cls) -> None:
        module = proc_cls.__module__.rsplit(".", 2)[-2]
        PROCESSOR_MAPPING_NAMES[model_type] = (module, proc_cls.__name__)
        _CLASS_NAMES[proc_cls.__name__] = (module, proc_cls.__name__)
