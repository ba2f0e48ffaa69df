"""BERTweet tokenizer family (reference models/bertweet/tokenization_bertweet.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.bertweet import BertweetTokenizer


def _tok(tmp_path, normalization=False):
    # fairseq vocab.txt lines are "<token> <count>"
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("lo@@ 10\nw 9\nlow 8\nping 7\n", encoding="utf-8")
    merges = tmp_path / "bpe.codes"
    # subword-nmt pairs + count; "</w>" marks word-final symbols
    merges.write_text("l o 5\nlo w</w> 4\np ing</w> 3\nin g</w> 2\ni n 1\n",
                      encoding="utf-8")
    return BertweetTokenizer(str(vocab), str(merges), normalization=normalization)


def test_tweet_normalization(tmp_path):
    tok = _tok(tmp_path)
    out = tok.normalize_tweet("hey @someone_1 see https://x.co/abc and www.b.org/z")
    assert "@USER" in out and "@someone_1" not in out
    assert out.count("HTTPURL") == 2


def test_normalization_applied_before_bpe(tmp_path):
    normalizing = _tok(tmp_path, normalization=True)
    plain = _tok(tmp_path)
    assert normalizing.tokenize("ping @bob") == plain.tokenize("ping @USER")


def test_bpe_merges_and_roundtrip(tmp_path):
    tok = _tok(tmp_path)
    assert tok.tokenize("low") == ["low"]
    ids = tok.encode("low", add_special_tokens=False)
    assert ids == [tok.encoder["low"]]
    assert tok.decode(ids) == "low"


def test_continuation_marker_for_partial_merge(tmp_path):
    tok = _tok(tmp_path)
    # "lox": merges "l o" applies, "lo x</w>" doesn't -> "lo@@", "x"
    assert tok.tokenize("lox") == ["lo@@", "x"]
