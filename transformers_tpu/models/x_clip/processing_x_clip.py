"""XCLIPProcessor: CLIP image processor applied to video frames + CLIP tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class XCLIPProcessor(ProcessorMixin):
    """Reference models/x_clip/processing_x_clip.py: ``videos`` (lists of
    frames) route through the image processor."""

    attributes = ["image_processor", "tokenizer"]

    def __call__(self, text=None, images=None, videos=None, **kwargs):
        if videos is not None and images is None:
            frames = []
            for v in videos if isinstance(videos, (list, tuple)) else [videos]:
                frames.extend(list(v))
            images = frames
        return super().__call__(text=text, images=images, **kwargs)
