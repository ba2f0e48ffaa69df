"""Code Llama family (reference models/code_llama/): llama skeleton + the
fill-in-the-middle tokenizer contract."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.code_llama import CodeLlamaTokenizer
from transformers_tpu.tokenization.base import PreTrainedTokenizer


def test_is_tokenizer_subclass():
    assert issubclass(CodeLlamaTokenizer, PreTrainedTokenizer)


def test_infill_prompt_layout():
    tok = CodeLlamaTokenizer.__new__(CodeLlamaTokenizer)
    prompt = tok.infill_prompt("def add(a, b):\n", "    return out\n")
    # PSM ordering: <PRE> prefix <SUF> suffix <MID> (reference
    # tokenization_code_llama.py fill-in-the-middle specials)
    pre = prompt.index(tok.fill_tokens["prefix"])
    suf = prompt.index(tok.fill_tokens["suffix"])
    mid = prompt.index(tok.fill_tokens["middle"])
    assert pre < suf < mid
    assert "def add(a, b):" in prompt[pre:suf]
    assert "return out" in prompt[suf:mid]
