"""Code Llama (reference models/code_llama/): Llama skeleton; this package
carries the infilling tokenizer contract (prefix/middle/suffix special
tokens over the Llama SentencePiece model)."""
from ...tokenization.base import PreTrainedTokenizer


class CodeLlamaTokenizer(PreTrainedTokenizer):
    """reference tokenization_code_llama.py: fill-in-the-middle specials."""

    fill_tokens = {"prefix": "▁<PRE>", "middle": "▁<MID>", "suffix": "▁<SUF>",
                   "eot": "▁<EOT>"}

    def infill_prompt(self, prefix: str, suffix: str) -> str:
        t = self.fill_tokens
        return f"{t['prefix']} {prefix}{t['suffix']}{suffix}{t['middle']}"
