"""mluke tokenizer-alias package (reference models/mluke/)."""

from alias_check import check_alias_package


def test_mluke_alias():
    check_alias_package("mluke", "MLukeTokenizer")
