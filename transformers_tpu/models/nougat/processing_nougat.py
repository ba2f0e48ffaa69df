"""Nougat processor (reference models/nougat/processing_nougat.py): Nougat
image processor + tokenizer; ``post_process_generation`` forwards to the
tokenizer's markdown cleanup when available."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class NougatProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def post_process_generation(self, generation, fix_markdown: bool = True):
        if hasattr(self.tokenizer, "post_process_generation"):
            return self.tokenizer.post_process_generation(
                generation, fix_markdown=fix_markdown)
        if isinstance(generation, list):
            return [self.post_process_generation(g, fix_markdown) for g in generation]
        return generation.strip()
