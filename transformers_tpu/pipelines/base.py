"""Pipeline base (reference src/transformers/pipelines/base.py:754
``Pipeline.__call__`` -> preprocess/_forward/postprocess :1146-1167)."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


class Pipeline:
    """Subclasses implement preprocess / _forward / postprocess and may
    override _sanitize_parameters to split kwargs between the three stages."""

    def __init__(self, model, tokenizer=None, image_processor=None, feature_extractor=None,
                 processor=None, video_processor=None, **kwargs):
        self.model = model
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.feature_extractor = feature_extractor
        self.processor = processor
        self.video_processor = video_processor
        self._init_kwargs = kwargs

    def _sanitize_parameters(self, **kwargs) -> tuple[dict, dict, dict]:
        return {}, {}, kwargs

    def preprocess(self, inputs, **kwargs) -> dict:
        raise NotImplementedError

    def _forward(self, model_inputs: dict, **kwargs):
        raise NotImplementedError

    def postprocess(self, model_outputs, **kwargs):
        raise NotImplementedError

    def __call__(self, inputs, **kwargs):
        pre_kw, fwd_kw, post_kw = self._sanitize_parameters(**kwargs)
        batched = isinstance(inputs, list)
        items = inputs if batched else [inputs]
        outputs = [self.run_single(item, pre_kw, fwd_kw, post_kw) for item in items]
        return outputs if batched else outputs[0]

    def run_single(self, item, pre_kw, fwd_kw, post_kw):
        model_inputs = self.preprocess(item, **pre_kw)
        model_outputs = self._forward(model_inputs, **fwd_kw)
        return self.postprocess(model_outputs, **post_kw)


def softmax_np(x: np.ndarray, axis=-1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)
