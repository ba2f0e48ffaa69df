"""mBART-50 tokenizer contract (reference models/mbart50/): src_lang code is
PREPENDED (unlike mbart's suffix layout) and eos appended."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.mbart50 import MBart50Tokenizer
from transformers_tpu.tokenization.base import PreTrainedTokenizer


def test_is_tokenizer_subclass():
    assert issubclass(MBart50Tokenizer, PreTrainedTokenizer)


def test_translation_inputs_prepend_lang_code():
    tok = MBart50Tokenizer.__new__(MBart50Tokenizer)
    out = tok.build_translation_inputs([10, 11, 12], src_lang_id=250004, eos_id=2)
    assert out == [250004, 10, 11, 12, 2]
