"""gpt_sw3 tokenizer-alias package (reference models/gpt_sw3/)."""

from alias_check import check_alias_package


def test_gpt_sw3_alias():
    check_alias_package("gpt_sw3", "GPTSw3Tokenizer")
