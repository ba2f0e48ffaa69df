"""TikToken/tekken converter parity: our rank-file conversion vs the same
algorithm executed by the Rust `tokenizers` library (the reference
TikTokenConverter output, convert_slow_tokenizer.py:1903-1978)."""

import base64
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.tokenization.engine import TokenizerEngine
from transformers_tpu.tokenization.tiktoken_convert import (
    GPT4_PATTERN,
    bytes_to_unicode,
    convert_tekken,
    convert_tiktoken,
)

TEXTS = [
    "hello world", "The quick brown fox jumps over 1234 lazy dogs!",
    "  leading spaces and\nnewlines\t tabs",
    "unicode: déjà vu – 北京 🚀", "can't won't I'll we've",
]


def _toy_ranks():
    """Deterministic toy BPE ranks: 256 bytes + merged tokens built by
    iterative pair merging over a tiny corpus."""
    corpus = (" ".join(TEXTS) + " the then they them hello help hell").encode()
    ranks = {bytes([i]): i for i in range(256)}
    words = [[bytes([b]) for b in corpus]]
    next_rank = 256
    for _ in range(60):
        counts = {}
        for w in words:
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        counts = {p: c for p, c in counts.items() if c >= 2}
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], -len(p[0] + p[1])))
        merged = best[0] + best[1]
        if merged in ranks:
            break
        ranks[merged] = next_rank
        next_rank += 1
        new_words = []
        for w in words:
            out = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words.append(out)
        words = new_words
    return ranks


def _write_tiktoken(path, ranks):
    with open(path, "w") as f:
        for token, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(token).decode() + " " + str(rank) + "\n")


def test_tiktoken_convert_matches_rust_reference(tmp_path):
    import tokenizers
    from tokenizers import Tokenizer, pre_tokenizers, decoders, processors, Regex
    from tokenizers.models import BPE

    ranks = _toy_ranks()
    tk_file = str(tmp_path / "toy.tiktoken")
    _write_tiktoken(tk_file, ranks)

    cfg = convert_tiktoken(tk_file)
    ours = TokenizerEngine(cfg)

    # reference conversion executed by the Rust library
    table = bytes_to_unicode()
    vocab = {"".join(table[b] for b in tok): r for tok, r in ranks.items()}
    merges = [(a, b) for a, b in cfg["model"]["merges"]]
    ref = Tokenizer(BPE(vocab, merges, fuse_unk=False))
    ref.model.ignore_merges = True
    ref.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(GPT4_PATTERN), behavior="isolated", invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    ref.decoder = decoders.ByteLevel()
    ref.post_processor = processors.ByteLevel(trim_offsets=False)

    for text in TEXTS:
        ref_ids = ref.encode(text).ids
        our_ids = ours.encode(text)["input_ids"]
        assert our_ids == ref_ids, (text, our_ids, ref_ids)
        assert ours.decode(our_ids) == ref.decode(ref_ids)


def test_tekken_convert_roundtrip(tmp_path):
    ranks = _toy_ranks()
    tekken = {
        "config": {"pattern": GPT4_PATTERN, "num_vocab_tokens": len(ranks),
                   "default_vocab_size": len(ranks) + 8,
                   "default_num_special_tokens": 8, "version": "v3"},
        "vocab": [{"rank": r, "token_bytes": base64.b64encode(t).decode(),
                   "token_str": None} for t, r in sorted(ranks.items(), key=lambda kv: kv[1])],
        "special_tokens": [
            {"rank": 0, "token_str": "<unk>", "is_control": True},
            {"rank": 1, "token_str": "<s>", "is_control": True},
            {"rank": 2, "token_str": "</s>", "is_control": True},
        ],
    }
    path = str(tmp_path / "tekken.json")
    with open(path, "w") as f:
        json.dump(tekken, f)
    engine = TokenizerEngine(convert_tekken(path))
    for text in TEXTS:
        ids = engine.encode(text)["input_ids"]
        assert all(i >= 8 for i in ids), "regular ids must sit after the special block"
        assert engine.decode(ids) == text
    # special tokens resolve to reserved low ids
    assert engine.encode("<s>")["input_ids"] == [1]

    # loading via PreTrainedTokenizer.from_pretrained picks tekken.json up
    from transformers_tpu.tokenization.base import PreTrainedTokenizer

    tok = PreTrainedTokenizer.from_pretrained(str(tmp_path))
    assert tok.engine.encode(TEXTS[0])["input_ids"] == engine.encode(TEXTS[0])["input_ids"]
