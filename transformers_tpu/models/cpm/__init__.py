"""CPM (reference models/cpm/): the CpmTokenizer wraps a SentencePiece model
behind a jieba word-segmentation pass; jieba is not in the image, so the
spm path loads and segmentation falls back to whitespace with a warning."""
from ...utils import logging
from ...tokenization.base import PreTrainedTokenizer

logger = logging.get_logger(__name__)


class CpmTokenizer(PreTrainedTokenizer):
    @classmethod
    def from_pretrained(cls, path, **kwargs):
        logger.warning_once(
            "jieba is unavailable; CpmTokenizer falls back to plain "
            "SentencePiece segmentation (reference pre-segments with jieba).")
        return super().from_pretrained(path, **kwargs)
