"""ByT5 byte tokenizer parity vs the torch reference."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.models.byt5.tokenization_byt5 import ByT5Tokenizer  # noqa: E402


def test_byt5_parity_vs_reference():
    from transformers import ByT5Tokenizer as TorchByT5

    ref = TorchByT5()
    ours = ByT5Tokenizer()
    for text in ["hello world", "Ünïcødé 字符 🎉", "", "a"]:
        r = ref(text)["input_ids"]
        o = ours(text)["input_ids"]
        assert o == r, (text, o, r)
        assert ours.decode(o, skip_special_tokens=True) == ref.decode(
            r, skip_special_tokens=True)


def test_byt5_roundtrip(tmp_path):
    tok = ByT5Tokenizer(extra_ids=10)
    d = str(tmp_path / "tok")
    tok.save_pretrained(d)
    tok2 = ByT5Tokenizer.from_pretrained(d)
    assert tok2("abc")["input_ids"] == tok("abc")["input_ids"]
