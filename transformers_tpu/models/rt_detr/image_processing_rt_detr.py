"""RT-DETR image processor (reference
models/rt_detr/image_processing_rt_detr.py): fixed 640x640 resize, rescale
only (no ImageNet normalization), DETR-format annotations/post-processing
inherited from the DETR tier. Also serves D-FINE."""

from __future__ import annotations

from ..detr.image_processing_detr import DetrImageProcessor


class RTDetrImageProcessor(DetrImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 640, "width": 640})
        kwargs.setdefault("do_normalize", False)
        kwargs.setdefault("do_pad", False)
        super().__init__(**kwargs)

    def resize_size(self, height: int, width: int):
        if "height" in self.size:
            return (self.size["height"], self.size["width"])
        return super().resize_size(height, width)
