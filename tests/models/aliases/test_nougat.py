"""nougat tokenizer-alias package (reference models/nougat/)."""

from alias_check import check_alias_package


def test_nougat_alias():
    check_alias_package("nougat", "NougatTokenizer")
