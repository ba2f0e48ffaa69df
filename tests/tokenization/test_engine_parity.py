"""Tokenizer engine parity vs the Rust `tokenizers` library (the reference's
native backend, SURVEY §2.9 row 1). The Rust lib is used ONLY as a test
oracle: we build tokenizer.json files with it and assert id-exact encode and
string-exact decode from our pure-Python interpreter."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from transformers_tpu.tokenization.engine import TokenizerEngine  # noqa: E402

CORPUS = [
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "  leading spaces and   multiple   spaces  ",
    "unicode: café naïve 中文分词 🤗🚀",
    "numbers 12345 and mixed a1b2c3, punctuation!!! (parens) [brackets]",
    "new\nlines\nand\ttabs",
    "don't stop'n believin'",
    "",
    "x",
    "CamelCaseWords and snake_case_words and kebab-case-words",
]


def roundtrip_check(rust_tok, corpus=CORPUS, check_decode=True):
    ours = TokenizerEngine.from_str(rust_tok.to_str())
    for text in corpus:
        ref = rust_tok.encode(text)
        got = ours.encode(text)
        assert got["input_ids"] == ref.ids, (
            f"text={text!r}\nrust={ref.tokens}\nours={ours.convert_ids_to_tokens(got['input_ids'])}"
        )
        if check_decode:
            assert ours.decode(ref.ids) == rust_tok.decode(ref.ids, skip_special_tokens=False), text


def make_bpe_byte_level():
    """GPT-2-style byte-level BPE trained on a tiny corpus."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers, processors

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.post_processor = processors.ByteLevel(trim_offsets=False)
    trainer = trainers.BpeTrainer(vocab_size=400, special_tokens=["<|endoftext|>"])
    tok.train_from_iterator(CORPUS * 20 + ["repetition builds merges"] * 50, trainer)
    return tok


def test_byte_level_bpe_parity():
    roundtrip_check(make_bpe_byte_level())


def test_byte_level_bpe_with_added_tokens():
    tok = make_bpe_byte_level()
    tok.add_special_tokens(["<|endoftext|>", "<|user|>"])
    ours_corpus = CORPUS + ["<|user|>Hello<|endoftext|>", "text <|user|> more"]
    roundtrip_check(tok, ours_corpus)


def test_wordpiece_bert_parity():
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, decoders, trainers, processors

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer()
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.decoder = decoders.WordPiece()
    trainer = trainers.WordPieceTrainer(vocab_size=400, special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]"])
    tok.train_from_iterator(CORPUS * 20, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", tok.token_to_id("[CLS]")), ("[SEP]", tok.token_to_id("[SEP]"))],
    )
    ours = TokenizerEngine.from_str(tok.to_str())
    for text in CORPUS:
        ref = tok.encode(text)
        got = ours.encode(text)
        assert got["input_ids"] == ref.ids, text
        assert got["token_type_ids"] == ref.type_ids, text
    # pair encoding
    ref = tok.encode("first sentence", "second one")
    got = ours.encode("first sentence", "second one")
    assert got["input_ids"] == ref.ids
    assert got["token_type_ids"] == ref.type_ids


def test_unigram_metaspace_parity():
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.UnigramTrainer(vocab_size=300, special_tokens=["<unk>"], unk_token="<unk>")
    tok.train_from_iterator(CORPUS * 20, trainer)
    roundtrip_check(tok, [c for c in CORPUS if c])


def test_llama3_style_tokenizer():
    """Llama-3 style: BPE + Split regex + ByteLevel(no prefix space), ignore_merges."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    base = make_bpe_byte_level()
    d = json.loads(base.to_str())
    d["model"]["ignore_merges"] = True
    d["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [
            {"type": "Split",
             "pattern": {"Regex": "(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\\r\\n\\p{L}\\p{N}]?\\p{L}+|\\p{N}{1,3}| ?[^\\s\\p{L}\\p{N}]+[\\r\\n]*|\\s*[\\r\\n]+|\\s+(?!\\S)|\\s+"},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False, "trim_offsets": True, "use_regex": False},
        ],
    }
    rust = Tokenizer.from_str(json.dumps(d))
    roundtrip_check(rust)


def test_byte_fallback_bpe():
    """Llama-2-style: BPE with byte_fallback and metaspace."""
    from tokenizers import Tokenizer, models, normalizers, decoders, trainers

    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
    tok.normalizer = normalizers.Sequence([
        normalizers.Prepend("▁"), normalizers.Replace(" ", "▁"),
    ])
    tok.decoder = decoders.Sequence([
        decoders.Replace("▁", " "), decoders.ByteFallback(), decoders.Fuse(),
        decoders.Strip(" ", 1, 0),
    ])
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=[f"<0x{b:02X}>" for b in range(256)],
    )
    tok.train_from_iterator([c.replace(" ", "▁") for c in CORPUS * 20], trainer)
    roundtrip_check(tok, [c for c in CORPUS if c])
