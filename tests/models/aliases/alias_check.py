"""Shared assertions for pure tokenizer-alias packages (reference ships the
same alias-only dirs — the modeling lives in the skeleton family each
package docstring names)."""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.tokenization.base import PreTrainedTokenizer


def check_alias_package(family: str, cls_name: str):
    mod = importlib.import_module(f"transformers_tpu.models.{family}")
    cls = getattr(mod, cls_name)
    assert issubclass(cls, PreTrainedTokenizer)
    # each alias package must document which modeling family serves it
    assert mod.__doc__ and "reference models/" in mod.__doc__
    return cls
