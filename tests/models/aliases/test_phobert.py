"""PhoBERT tokenizer family (reference models/phobert/tokenization_phobert.py):
fairseq vocab.txt + bpe.codes subword-nmt BPE over syllable-segmented text."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.phobert import PhobertTokenizer


def _tok(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("Tôi 10\nlà 9\nl@@ 8\nà 7\n", encoding="utf-8")
    merges = tmp_path / "bpe.codes"
    merges.write_text("T ô 5\nTô i</w> 4\nl à</w> 3\n", encoding="utf-8")
    return PhobertTokenizer(str(vocab), str(merges))


def test_fairseq_special_offsets(tmp_path):
    tok = _tok(tmp_path)
    # fairseq convention: bos=0 pad=1 eos=2 unk=3, then vocab entries
    assert tok.encoder["<s>"] == 0
    assert tok.encoder["<pad>"] == 1
    assert tok.encoder["</s>"] == 2
    assert tok.encoder["<unk>"] == 3


def test_word_segmented_tokenize(tmp_path):
    tok = _tok(tmp_path)
    ids = tok.encode("Tôi là", add_special_tokens=False)
    assert ids == [tok.encoder["Tôi"], tok.encoder["là"]]
    assert tok.decode(ids) == "Tôi là"
    # cls/sep framing
    framed = tok.encode("Tôi là")
    assert framed[0] == tok.encoder["<s>"] and framed[-1] == tok.encoder["</s>"]
