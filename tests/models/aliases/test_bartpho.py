"""bartpho tokenizer-alias package (reference models/bartpho/)."""

from alias_check import check_alias_package


def test_bartpho_alias():
    check_alias_package("bartpho", "BartphoTokenizer")
