"""layoutxlm tokenizer-alias package (reference models/layoutxlm/)."""

from alias_check import check_alias_package


def test_layoutxlm_alias():
    check_alias_package("layoutxlm", "LayoutXLMTokenizer")
