"""DETR image processor (reference
src/transformers/models/detr/image_processing_detr_fast.py): resize +
rescale + normalize on device (BaseImageProcessor pipeline) plus the
detection post-processing helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processing_utils import BaseImageProcessor


class DetrImageProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values", "pixel_mask"]

    @staticmethod
    def post_process_object_detection(outputs, threshold=0.5, target_sizes=None):
        from .modeling_detr import DetrForObjectDetection

        return DetrForObjectDetection.post_process_object_detection(
            outputs, threshold=threshold, target_sizes=target_sizes)
