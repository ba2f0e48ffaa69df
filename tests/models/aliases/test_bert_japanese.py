"""BertJapanese tokenizer alias family (reference models/bert_japanese/)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.bert_japanese import BertJapaneseTokenizer


def _tok(tmp_path, extra=()):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "吾輩", "は", "猫", "で", "ある", "##猫", "。"] + list(extra)
    f = tmp_path / "vocab.txt"
    f.write_text("\n".join(vocab), encoding="utf-8")
    return BertJapaneseTokenizer(str(f))


def test_wordpiece_encode_decode(tmp_path):
    tok = _tok(tmp_path)
    toks = tok.tokenize("吾輩 は 猫 で ある 。")
    assert toks == ["吾輩", "は", "猫", "で", "ある", "。"]
    ids = tok.encode("吾輩 は 猫")
    assert ids[0] == tok.vocab["[CLS]"] and ids[-1] == tok.vocab["[SEP]"]
    assert tok.decode(ids) == "吾輩 は 猫"


def test_punctuation_split_and_unk(tmp_path):
    tok = _tok(tmp_path)
    assert tok.tokenize("猫。犬") == ["猫", "。", "[UNK]"]


def test_character_mode(tmp_path):
    tok = _tok(tmp_path)
    tok.subword_type = "character"
    assert tok.tokenize("猫は") == ["猫", "は"]


def test_external_analyzers_gated(tmp_path):
    import pytest

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("[UNK]\n", encoding="utf-8")
    with pytest.raises(ImportError):
        BertJapaneseTokenizer(str(vocab), word_tokenizer_type="mecab")
