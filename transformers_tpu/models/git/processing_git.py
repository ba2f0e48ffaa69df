"""GitProcessor: CLIP image processor + BERT tokenizer."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class GitProcessor(ProcessorMixin):
    """Reference models/git/processing_git.py."""

    attributes = ["image_processor", "tokenizer"]
