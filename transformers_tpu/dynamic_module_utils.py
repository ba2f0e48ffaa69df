"""Remote (custom) code loading.

TPU-native analog of reference src/transformers/dynamic_module_utils.py
(``get_class_from_dynamic_module`` :516, ``resolve_trust_remote_code`` :712):
checkpoints may ship custom model code as ``*.py`` files referenced from
``config.json``'s ``auto_map``. Execution is gated behind an explicit
``trust_remote_code=True`` — Python from a checkpoint runs HOST-side only
(SURVEY A.9).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import typing
from typing import Optional

from .utils import logging
from .utils.hub import cached_file

logger = logging.get_logger(__name__)


def resolve_trust_remote_code(trust_remote_code: Optional[bool], model_name: str,
                              has_local_code: bool, has_remote_code: bool) -> bool:
    """reference dynamic_module_utils.py:712 — explicit opt-in only (no
    interactive prompt in a library context)."""
    if has_remote_code and not has_local_code:
        if trust_remote_code is None:
            raise ValueError(
                f"Loading {model_name} requires executing custom code shipped with the "
                "checkpoint. Pass `trust_remote_code=True` to allow it, after reviewing "
                "the code.")
        if trust_remote_code is False:
            raise ValueError(
                f"Loading {model_name} requires custom code but trust_remote_code=False.")
    return bool(trust_remote_code) and has_remote_code


def get_cached_module_file(pretrained_model_name_or_path, module_file: str) -> str:
    """Resolve a custom-code .py file from the checkpoint (reference :346)."""
    return cached_file(str(pretrained_model_name_or_path), module_file)


def get_class_from_dynamic_module(class_reference: str, pretrained_model_name_or_path,
                                  **kwargs):
    """Load `module_name.ClassName` from checkpoint-shipped code
    (reference dynamic_module_utils.py:516)."""
    module_name, class_name = class_reference.rsplit(".", 1)
    file_path = get_cached_module_file(pretrained_model_name_or_path, module_name + ".py")
    unique = f"transformers_tpu_dynamic.{abs(hash(os.path.abspath(file_path)))}_{module_name}"
    if unique in sys.modules:
        module = sys.modules[unique]
    else:
        spec = importlib.util.spec_from_file_location(unique, file_path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[unique] = module
        spec.loader.exec_module(module)
    return getattr(module, class_name)


def load_custom_model_class(config, pretrained_model_name_or_path, auto_class: str,
                            trust_remote_code: Optional[bool]):
    """Route an auto-class load through the checkpoint's auto_map if present."""
    auto_map = getattr(config, "auto_map", None) or {}
    if auto_class not in auto_map:
        return None
    resolve_trust_remote_code(trust_remote_code, str(pretrained_model_name_or_path),
                              has_local_code=False, has_remote_code=True)
    logger.warning(
        f"Executing custom code from {pretrained_model_name_or_path} "
        f"({auto_map[auto_class]}) — only do this for checkpoints you trust.")
    return get_class_from_dynamic_module(auto_map[auto_class], pretrained_model_name_or_path)
