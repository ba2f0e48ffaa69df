"""Family tokenizer parity: fairseq-BPE (BERTweet/PhoBERT), HerBERT XLM-BPE,
MyT5 byte morphology, BertJapanese fallback — each vs the installed torch
reference tokenizer on fabricated artifacts."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _write_fairseq_files(d):
    words = ["hel@@", "lo", "wor@@", "ld", "hello", "the"]
    (d / "vocab.txt").write_text("".join(f"{w} {10-i}\n" for i, w in enumerate(words)))
    merges = ["h e 10", "he l 9", "hel l@@ 8", "l o</w> 7", "w o 6", "wo r 5",
              "l d</w> 4", "t h 3", "th e</w> 2"]
    (d / "bpe.codes").write_text("".join(m + "\n" for m in merges))


def test_bertweet_fairseq_bpe_parity(tmp_path):
    import transformers

    from transformers_tpu.models.bertweet import BertweetTokenizer

    _write_fairseq_files(tmp_path)
    ref = transformers.BertweetTokenizer(str(tmp_path / "vocab.txt"),
                                         str(tmp_path / "bpe.codes"),
                                         normalization=False)
    ours = BertweetTokenizer.from_pretrained(tmp_path)
    for text in ["hello world", "the hell lo", "held weld"]:
        assert ours.tokenize(text) == ref.tokenize(text), text
        assert ours.encode(text) == ref.encode(text), text


def test_phobert_fairseq_bpe_parity(tmp_path):
    import transformers

    from transformers_tpu.models.phobert import PhobertTokenizer

    _write_fairseq_files(tmp_path)
    ref = transformers.PhobertTokenizer(str(tmp_path / "vocab.txt"),
                                        str(tmp_path / "bpe.codes"))
    ours = PhobertTokenizer.from_pretrained(tmp_path)
    for text in ["hello world", "the hold"]:
        assert ours.encode(text) == ref.encode(text), text


def test_myt5_byte_rewriter_parity(tmp_path):
    import transformers

    from transformers_tpu.models.myt5 import MyT5Tokenizer

    maps = {
        "decompose_map": {"61": "61 61", "62 63": "41"},
        "merge_map": {"61 61 61": "5a", "64 65": "59"},
    }
    (tmp_path / "byte_maps.json").write_text(json.dumps(maps))
    ref = transformers.MyT5Tokenizer(str(tmp_path / "byte_maps.json"))
    ours = MyT5Tokenizer.from_pretrained(tmp_path)
    for text in ["abcde", "aaa bcd", "hello a world"]:
        assert ours.tokenize(text) == ref._tokenize(text), text
        ids = ours.encode(text)
        assert ids == ref(text)["input_ids"], text
        assert ours.decode(ids) == ref.decode(ids, skip_special_tokens=True), text


def test_bert_japanese_fallback(tmp_path):
    from transformers_tpu.models.bert_japanese import BertJapaneseTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "wor",
             "##ld", "w", "o", "r", "l", "d", "。"]
    (tmp_path / "vocab.txt").write_text("".join(v + "\n" for v in vocab))
    tok = BertJapaneseTokenizer.from_pretrained(tmp_path)
    assert tok.tokenize("hello world。") == ["hello", "wor", "##ld", "。"]
    char_tok = BertJapaneseTokenizer.from_pretrained(
        tmp_path, subword_tokenizer_type="character")
    assert char_tok.tokenize("world") == ["w", "o", "r", "l", "d"]
    with pytest.raises(ImportError):
        BertJapaneseTokenizer.from_pretrained(tmp_path, word_tokenizer_type="mecab")


def test_herbert_xlm_bpe_parity(tmp_path):
    from tokenizers import Tokenizer, pre_tokenizers, normalizers
    from tokenizers.models import BPE

    from transformers_tpu.models.herbert import HerbertTokenizer

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4,
             "h": 5, "e": 6, "l": 7, "o": 8, "w": 9, "r": 10, "d": 11,
             "o</w>": 12, "d</w>": 13, "he": 14, "hel": 15, "lo</w>": 16,
             "wo": 17, "rld</w>": 18, "rl": 19, ",</w>": 20, ",": 21}
    merges = [("h", "e"), ("he", "l"), ("l", "o</w>"), ("w", "o"),
              ("r", "l"), ("rl", "d</w>")]
    ref = Tokenizer(BPE(vocab, merges, end_of_word_suffix="</w>", unk_token="<unk>"))
    ref.normalizer = normalizers.BertNormalizer(lowercase=False, strip_accents=False)
    ref.pre_tokenizer = pre_tokenizers.BertPreTokenizer()

    import json as _json
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "".join(f"{a} {b}\n" for a, b in merges))
    ours = HerbertTokenizer.from_pretrained(str(tmp_path))
    for text in ["hello world", "hold, low"]:
        assert ours.engine.encode(text)["input_ids"] == ref.encode(text).ids, text
