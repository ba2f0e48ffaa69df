"""HerBERT tokenizer family (reference models/herbert/tokenization_herbert.py):
XLM-style BPE with </w> end-of-word suffix built from vocab.json + merges.txt."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.herbert import HerbertTokenizer
from transformers_tpu.models.herbert.tokenization_herbert import herbert_engine_config


def _write_assets(tmp_path):
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4,
             "a": 5, "l": 6, "a</w>": 7, "al": 8, "ala</w>": 9,
             "m": 10, "ma</w>": 11, "kot": 12, "kota</w>": 13, "k": 14,
             "o": 15, "t": 16, "ot": 17}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\na l\nal a</w>\nm a</w>\no t\nk ot\nkot a</w>\n",
        encoding="utf-8")
    return vocab


def test_bpe_end_of_word_suffix(tmp_path):
    vocab = _write_assets(tmp_path)
    tok = HerbertTokenizer.from_pretrained(str(tmp_path))
    ids = tok.encode("ala ma kota", add_special_tokens=False)
    assert ids == [vocab["ala</w>"], vocab["ma</w>"], vocab["kota</w>"]]
    # BPEDecoder maps the </w> suffix to a space, so a word-final token
    # leaves one trailing space (same as the Rust decoder's raw output)
    assert tok.decode(ids).strip() == "ala ma kota"


def test_engine_config_shape(tmp_path):
    vocab = _write_assets(tmp_path)
    cfg = herbert_engine_config(vocab, [("l", "a</w>")])
    assert cfg["model"]["end_of_word_suffix"] == "</w>"
    assert cfg["decoder"] == {"type": "BPEDecoder", "suffix": "</w>"}
    specials = {t["content"] for t in cfg["added_tokens"]}
    assert {"<s>", "</s>", "<unk>"} <= specials
