"""SmolVLM processor (reference models/smolvlm/processing_smolvlm.py): the
Idefics3 split-grid prompt format (same row/col tags and global image), with
SmolVLM's own default image_seq_len."""

from __future__ import annotations

from ..idefics3.processing_idefics3 import Idefics3Processor


class SmolVLMProcessor(Idefics3Processor):
    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_len: int = 81, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         image_seq_len=image_seq_len, **kwargs)
