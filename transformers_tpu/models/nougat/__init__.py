"""Nougat (reference models/nougat/): document-OCR VisionEncoderDecoder
(Donut Swin encoder + mBART decoder, served through the
vision-encoder-decoder composite family); this package carries the fast
tokenizer alias plus the postprocessing contract."""
from ...tokenization.base import PreTrainedTokenizer as NougatTokenizer  # noqa: F401
from ..donut.image_processing_donut import NougatImageProcessor
from .processing_nougat import NougatProcessor
