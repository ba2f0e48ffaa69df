"""Native C++ BPE engine: build, parity vs the Python merge loop, speed."""

import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.native import NativeBPE, get_lib  # noqa: E402


def test_native_library_builds():
    lib = get_lib()
    assert lib is not None, "g++ build of the native BPE library failed"


def _random_merge_table(vocab_size=300, n_merges=200, seed=0):
    """Synthetic but well-formed merge table over ids: merges produce fresh ids."""
    rng = np.random.default_rng(seed)
    merges = []
    next_id = vocab_size
    existing = list(range(vocab_size))
    for _ in range(n_merges):
        l, r = rng.choice(existing, 2)
        merges.append((int(l), int(r), next_id))
        existing.append(next_id)
        next_id += 1
    return merges


def _python_bpe(ids, ranks):
    parts = list(ids)
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r[0] < best_rank):
                best_rank, best_i = r[0], i
        if best_rank is None:
            break
        merged = ranks[(parts[best_i], parts[best_i + 1])][1]
        parts = parts[:best_i] + [merged] + parts[best_i + 2:]
    return parts


def test_native_matches_python_reference():
    merges = _random_merge_table()
    ranks = {(l, r): (i, m) for i, (l, r, m) in enumerate(merges)}
    native = NativeBPE(merges)
    rng = np.random.default_rng(1)
    for trial in range(200):
        n = int(rng.integers(1, 40))
        ids = [int(x) for x in rng.integers(0, 300, n)]
        assert native.encode(ids) == _python_bpe(ids, ranks), (trial, ids)


def test_engine_uses_native_and_matches_rust_tokenizers(tmp_path):
    """End-to-end: our engine (with the C++ hot loop active) == the Rust
    tokenizers library on a real byte-level BPE tokenizer.json."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    corpus = [
        "hello world, this is a tokenizer parity test.",
        "The quick brown fox jumps over the lazy dog 1234567890!",
        "def f(x): return x ** 2  # python",
        "naïve café — unicode ✓ and emoji 🙂 tests",
    ] * 8
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(vocab_size=400, special_tokens=["<s>", "</s>"])
    tok.train_from_iterator(corpus, trainer)
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    from transformers_tpu.tokenization.engine import TokenizerEngine

    engine = TokenizerEngine.from_file(path)
    bpe = engine.model
    bpe._try_native()
    assert bpe._native is not None, "engine did not activate the native path"
    for text in corpus[:4] + ["unseen wordzzz qqq"]:
        ours = engine.encode(text, add_special_tokens=False)["input_ids"]
        theirs = tok.encode(text).ids
        assert ours == theirs, text


def test_native_speedup_on_long_words():
    merges = _random_merge_table(vocab_size=300, n_merges=280)
    ranks = {(l, r): (i, m) for i, (l, r, m) in enumerate(merges)}
    native = NativeBPE(merges)
    rng = np.random.default_rng(2)
    words = [[int(x) for x in rng.integers(0, 300, 400)] for _ in range(50)]

    def timeit(fn):
        best = float("inf")
        for _ in range(3):  # min-of-3: robust to CI load spikes
            t0 = time.perf_counter()
            for w in words:
                fn(w)
            best = min(best, time.perf_counter() - t0)
        return best

    native_t = timeit(native.encode)
    python_t = timeit(lambda w: _python_bpe(w, ranks))
    assert native_t < python_t, (native_t, python_t)
