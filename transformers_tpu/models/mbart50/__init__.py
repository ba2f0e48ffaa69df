"""mBART-50 (reference models/mbart50/): mbart skeleton; this package
carries the 50-language tokenizer contract (src_lang code prepended,
eos appended — reference tokenization_mbart50.py)."""
from ...tokenization.base import PreTrainedTokenizer


class MBart50Tokenizer(PreTrainedTokenizer):
    def build_translation_inputs(self, ids: list[int], src_lang_id: int,
                                 eos_id: int) -> list[int]:
        return [src_lang_id] + list(ids) + [eos_id]
