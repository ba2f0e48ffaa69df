"""Legacy vocab.txt (WordPiece/BERT) loading parity vs torch BertTokenizer."""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world", "hel",
         "##lo", "po", "##ta", "##to", "ta", "##co", "café", "cafe"]


def make_legacy_bert_dir(tmp_path, **tok_kwargs):
    from transformers import BertTokenizer

    d = str(tmp_path)
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB))
    t = BertTokenizer.from_pretrained(d, **tok_kwargs)
    t.save_pretrained(d)
    tj = os.path.join(d, "tokenizer.json")
    if os.path.exists(tj):
        os.remove(tj)  # force the legacy path
    return t, d


@pytest.mark.parametrize("kwargs", [
    {},
    {"do_lower_case": False},
    {"do_lower_case": True, "strip_accents": True},
])
def test_vocab_txt_parity(tmp_path, kwargs):
    ref, d = make_legacy_bert_dir(tmp_path, **kwargs)
    tok = ttpu.AutoTokenizer.from_pretrained(d)
    for text in ["hello potato world", "Taco hello", "unknownzz", "café hello",
                 "HELLO TACO", "hel lo"]:
        ours = tok(text)["input_ids"]
        theirs = ref(text)["input_ids"]
        assert list(ours) == list(theirs), (text, ours, theirs)


def test_vocab_txt_pair_encoding(tmp_path):
    ref, d = make_legacy_bert_dir(tmp_path)
    tok = ttpu.AutoTokenizer.from_pretrained(d)
    ours = tok("hello world", "potato")["input_ids"]
    theirs = ref("hello world", "potato")["input_ids"]
    assert list(ours) == list(theirs)


def test_vocab_txt_decode(tmp_path):
    ref, d = make_legacy_bert_dir(tmp_path)
    tok = ttpu.AutoTokenizer.from_pretrained(d)
    ids = ref("hello potato")["input_ids"]
    assert tok.decode(ids, skip_special_tokens=True) == ref.decode(ids, skip_special_tokens=True)
