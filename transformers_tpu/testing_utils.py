"""Testing utilities.

TPU-native analog of reference src/transformers/testing_utils.py: capability
gates (``require_*`` :483-740 — skip, don't fail, when a backend is absent)
and ``Expectations`` (:3376 — per-(device, variant) golden values so one test
carries goldens for several hardware targets).
"""

from __future__ import annotations

import importlib.util
import os
import unittest
from typing import Any, Optional

import jax


def is_tpu_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except RuntimeError:
        return "cpu"


def _skip_unless(condition: bool, reason: str):
    return unittest.skipUnless(condition, reason)


def require_tpu(test_case):
    """Skip unless a real TPU backend is attached."""
    return _skip_unless(is_tpu_available(), "test requires a TPU")(test_case)


def require_multichip(test_case):
    """Skip unless >1 device is visible (virtual CPU meshes count)."""
    return _skip_unless(len(jax.devices()) > 1, "test requires multiple devices")(test_case)


def require_torch(test_case):
    return _skip_unless(importlib.util.find_spec("torch") is not None,
                        "test requires torch")(test_case)


def require_reference_transformers(test_case):
    return _skip_unless(importlib.util.find_spec("transformers") is not None,
                        "test requires the torch transformers reference")(test_case)


def require_tokenizers_lib(test_case):
    return _skip_unless(importlib.util.find_spec("tokenizers") is not None,
                        "test requires the tokenizers library")(test_case)


def require_native_toolchain(test_case):
    import shutil

    return _skip_unless(shutil.which("g++") is not None, "test requires g++")(test_case)


def slow(test_case):
    """Gate long tests behind RUN_SLOW=1 (reference testing_utils.py:423)."""
    return _skip_unless(os.environ.get("RUN_SLOW", "0") == "1",
                        "slow test: set RUN_SLOW=1")(test_case)


class Expectations(dict):
    """Per-device golden values (reference testing_utils.py:3376).

    Keys are (device_type, variant) tuples; ``get_expectation()`` picks the
    most specific match for the current backend::

        expected = Expectations({
            ("cpu", None): 1.23,
            ("tpu", "v5e"): 1.25,
            ("tpu", None): 1.24,
        }).get_expectation()
    """

    def get_expectation(self) -> Any:
        platform = "tpu" if is_tpu_available() else jax.devices()[0].platform
        kind = device_kind().lower()
        best, best_score = None, -1
        for (dev, variant), value in self.items():
            if dev is not None and dev != platform:
                continue
            score = (dev is not None) + 2 * (variant is not None and variant.lower() in kind)
            if variant is not None and variant.lower() not in kind:
                continue
            if score > best_score:
                best, best_score = value, score
        if best_score < 0:
            raise KeyError(f"No expectation for platform={platform!r} kind={kind!r}")
        return best
