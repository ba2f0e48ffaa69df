"""Quantizer framework.

TPU-native analog of reference src/transformers/quantizers/base.py:73
(``HfQuantizer`` lifecycle) + utils/quantization_config.py. A quantizer
transforms the loaded param pytree (the functional analog of the reference's
module-swap ``preprocess_model``): quantized Linear leaves become
``{"weight": int8/packed, "weight_scale": [out]}`` and the Linear forward
dequantizes on the fly (XLA fuses the dequant into the matmul).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from ..utils import logging

logger = logging.get_logger(__name__)

_QUANTIZER_REGISTRY: dict[str, type] = {}


def register_quantizer(method: str):
    def deco(cls):
        _QUANTIZER_REGISTRY[method] = cls
        return cls

    return deco


@dataclass
class QuantizationConfig:
    """Base config (reference utils/quantization_config.py)."""

    quant_method: str = ""
    # param-path regexes never quantized (lm_head, embeddings, norms by default)
    modules_to_not_convert: tuple = (r"embed", r"lm_head", r"norm", r"\.bias$", r"logit")

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)


class Quantizer:
    """Lifecycle hooks (reference quantizers/base.py:73)."""

    def __init__(self, config: QuantizationConfig):
        self.config = config

    def should_quantize(self, key: str, value) -> bool:
        if value.ndim != 2 or not key.endswith("weight"):
            return False
        return not any(re.search(p, key) for p in self.config.modules_to_not_convert)

    def quantize_tensor(self, key: str, value):
        raise NotImplementedError

    def postprocess_model(self, model):
        pass


def get_quantizer(config: QuantizationConfig) -> Quantizer:
    if config.quant_method not in _QUANTIZER_REGISTRY:
        raise KeyError(f"Unknown quant_method {config.quant_method!r}; "
                       f"known: {sorted(_QUANTIZER_REGISTRY)}")
    return _QUANTIZER_REGISTRY[config.quant_method](config)


def quantize_params(model, params: dict, config: QuantizationConfig) -> dict:
    """Walk the param tree and quantize eligible Linear weights in place
    (the load-time analog of reference ``preprocess_model`` +
    ``param_needs_quantization``)."""
    from ..utils.generic import flatten_dict, set_nested

    quantizer = get_quantizer(config)
    flat = flatten_dict(params)
    n = 0
    for key, value in list(flat.items()):
        if key + "_scale" in flat:
            continue  # already quantized (re-quantizing int8 codes = garbage)
        if not quantizer.should_quantize(key, value):
            continue
        q, scale = quantizer.quantize_tensor(key, value)
        set_nested(params, key, q)
        set_nested(params, key + "_scale", scale)
        n += 1
    logger.info(f"Quantized {n} weights with {config.quant_method}")
    quantizer.postprocess_model(model)
    return params
