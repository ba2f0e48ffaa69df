"""MyT5 morphology-aware byte tokenizer (reference models/myt5/tokenization_myt5.py)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from transformers_tpu.models.myt5 import MyT5Tokenizer
from transformers_tpu.models.myt5.tokenization_myt5 import ByteRewriter


def _tok(tmp_path, decompose=None, merge=None):
    maps = {"decompose_map": decompose or {}, "merge_map": merge or {}}
    f = tmp_path / "byte_maps.json"
    f.write_text(json.dumps(maps), encoding="utf-8")
    return MyT5Tokenizer(str(f))


def test_plain_byte_roundtrip(tmp_path):
    tok = _tok(tmp_path)
    text = "héllo ✓"
    ids = tok.encode(text)
    assert ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == text
    assert tok.vocab_size == 259


def test_merge_rules_compress_and_invert(tmp_path):
    # merge "he" (68 65) into one sentinel byte 00
    tok = _tok(tmp_path, merge={"68 65": "00"})
    toks = tok.tokenize("hex")
    assert toks == ["00", "78"]
    ids = tok.convert_tokens_to_ids(toks)
    assert tok.decode(ids) == "hex"


def test_decompose_then_merge_order(tmp_path):
    # decompose 'A' (41) -> 61 5f, then merge 61 5f -> 01
    tok = _tok(tmp_path, decompose={"41": "61 5f"}, merge={"61 5f": "01"})
    assert tok.tokenize("A") == ["01"]
    assert tok.decode(tok.encode("A", add_special_tokens=False)) == "A"


def test_rewriter_longest_match():
    rw = ByteRewriter({"61": "aa", "61 62": "bb"})
    assert rw.rewrite_bytes(["61", "62"]) == ["bb"]
    assert rw.rewrite_bytes(["61", "63"]) == ["aa", "63"]
