"""AutoVideoProcessor (reference models/auto/video_processing_auto.py).

Resolves a per-family video processor from ``video_preprocessor_config.json``
(``video_processor_type``) or the model config's ``model_type``; falls back to
the generic :class:`BaseVideoProcessor` so repos without a per-family class
still produce ``pixel_values_videos``.
"""

from __future__ import annotations

import importlib
import json

from ...utils.hub import VIDEO_PROCESSOR_NAME, cached_file
from ...video_processing_utils import BaseVideoProcessor

# model_type -> (models submodule, class name)
VIDEO_PROCESSOR_MAPPING_NAMES: dict[str, tuple[str, str]] = {
    "qwen2_vl": ("qwen2_vl", "Qwen2VLVideoProcessor"),
    "qwen2_5_vl": ("qwen2_vl", "Qwen2VLVideoProcessor"),
    "qwen3_vl": ("qwen2_vl", "Qwen2VLVideoProcessor"),
    "qwen3_vl_moe": ("qwen2_vl", "Qwen2VLVideoProcessor"),
    "llava_onevision": ("llava_onevision", "LlavaOnevisionVideoProcessor"),
    "llava_next_video": ("llava_next_video", "LlavaNextVideoVideoProcessor"),
    "video_llava": ("video_llava", "VideoLlavaVideoProcessor"),
    "videomae": ("videomae", "VideoMAEVideoProcessor"),
    "timesformer": ("videomae", "TimesformerVideoProcessor"),
    "vivit": ("videomae", "VivitVideoProcessor"),
    "vjepa2": ("vjepa2", "VJEPA2VideoProcessor"),
    "internvl": ("internvl", "InternVLVideoProcessor"),
    "smolvlm": ("smolvlm", "SmolVLMVideoProcessor"),
    "glm4v": ("glm4v", "Glm4vVideoProcessor"),
}

_CLASS_NAMES: dict[str, tuple[str, str]] = {
    mod_cls[1]: mod_cls for mod_cls in VIDEO_PROCESSOR_MAPPING_NAMES.values()
}
# the reference's qwen2_5_vl ships the same pipeline under its own name
_CLASS_NAMES["Qwen2_5_VLVideoProcessor"] = ("qwen2_vl", "Qwen2VLVideoProcessor")


def _resolve(entry):
    module, cname = entry
    return getattr(importlib.import_module(f"transformers_tpu.models.{module}"), cname)


class AutoVideoProcessor:
    def __init__(self):
        raise OSError("Use AutoVideoProcessor.from_pretrained.")

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> BaseVideoProcessor:
        proc_cls = None
        resolved = cached_file(str(pretrained_model_name_or_path), VIDEO_PROCESSOR_NAME,
                               _raise_exceptions_for_missing_entries=False)
        if resolved:
            with open(resolved, encoding="utf-8") as f:
                name = json.load(f).get("video_processor_type")
            if name in _CLASS_NAMES:
                proc_cls = _resolve(_CLASS_NAMES[name])
        if proc_cls is None:
            try:
                from .configuration_auto import AutoConfig

                config = AutoConfig.from_pretrained(pretrained_model_name_or_path)
                model_type = getattr(config, "model_type", None)
                if model_type in VIDEO_PROCESSOR_MAPPING_NAMES:
                    proc_cls = _resolve(VIDEO_PROCESSOR_MAPPING_NAMES[model_type])
            except Exception:  # noqa: BLE001 — processor-only repos have no config
                pass
        if proc_cls is None:
            proc_cls = BaseVideoProcessor
        return proc_cls.from_pretrained(pretrained_model_name_or_path, **kwargs)

    @classmethod
    def register(cls, model_type: str, proc_cls) -> None:
        module = proc_cls.__module__.rsplit(".", 2)[-2]
        VIDEO_PROCESSOR_MAPPING_NAMES[model_type] = (module, proc_cls.__name__)
        _CLASS_NAMES[proc_cls.__name__] = (module, proc_cls.__name__)
