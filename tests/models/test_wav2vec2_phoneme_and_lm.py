"""Wav2Vec2Phoneme tokenizer parity vs the torch reference tokenizer, and
the in-tree CTC prefix beam search sanity vs greedy collapse."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

transformers = pytest.importorskip("transformers")

VOCAB = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3,
         "AH": 4, "B": 5, "K": 6, "T": 7, "S": 8, "|": 9}


def _write_vocab(tmp_path):
    import json

    d = tmp_path / "phon"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(VOCAB))
    return str(d)


def test_phoneme_tokenizer_parity(tmp_path):
    from transformers_tpu.models.wav2vec2_phoneme import (
        Wav2Vec2PhonemeCTCTokenizer,
    )

    d = _write_vocab(tmp_path)
    ref = transformers.Wav2Vec2PhonemeCTCTokenizer(
        str(Path(d) / "vocab.json"), do_phonemize=False,
        word_delimiter_token="|")
    ours = Wav2Vec2PhonemeCTCTokenizer.from_pretrained(
        d, do_phonemize=False, word_delimiter_token="|")

    text = "B AH T K AH S"
    assert ours.tokenize(text) == ref.tokenize(text)
    ids = ours.convert_tokens_to_ids(ours.tokenize(text))
    assert ids == ref.convert_tokens_to_ids(ref.tokenize(text))

    # CTC decode: repeats collapse, pads drop, word delimiter filtered
    stream = [5, 5, 0, 4, 4, 4, 0, 7, 9, 6, 6, 0, 8]
    assert ours.decode(stream) == ref.decode(stream)
    assert ours.decode(stream, filter_word_delimiter_token=False) == \
        ref.decode(stream, filter_word_delimiter_token=False)

    # round-trip through save_pretrained
    d2 = str(tmp_path / "resaved")
    ours.save_pretrained(d2)
    again = Wav2Vec2PhonemeCTCTokenizer.from_pretrained(d2)
    assert again.decode(stream) == ours.decode(stream)


def test_ctc_beam_search_beats_greedy():
    from transformers_tpu.models.wav2vec2_with_lm.processing_wav2vec2_with_lm import (
        ctc_beam_search,
    )

    rng = np.random.default_rng(0)
    # construct logits where greedy picks blank-heavy path but the summed
    # probability mass favors token 2
    T, V = 6, 4
    logits = rng.standard_normal((T, V)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ids, score = ctc_beam_search(logp, blank_id=0, beam_width=8)
    assert isinstance(ids, list) and np.isfinite(score)
    # beam result's probability >= greedy path's collapsed probability
    greedy = logp.argmax(-1)
    g_score = logp[np.arange(T), greedy].sum()
    assert score >= g_score - 1e-6
