"""barthez tokenizer-alias package (reference models/barthez/)."""

from alias_check import check_alias_package


def test_barthez_alias():
    check_alias_package("barthez", "BarthezTokenizer")
