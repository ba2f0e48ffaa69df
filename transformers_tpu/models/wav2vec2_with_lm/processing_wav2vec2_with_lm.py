"""Wav2Vec2 processor with LM-boosted CTC decoding (reference
models/wav2vec2_with_lm/processing_wav2vec2_with_lm.py). The reference
delegates to pyctcdecode + kenlm; here the beam search is implemented
in-tree (pure Python over host logits) and an external ``pyctcdecode``
decoder is used when importable, so hub repos carrying an LM folder still
load. Without an LM, beams are ranked by logit score alone."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np


@dataclass
class Wav2Vec2DecoderWithLMOutput:
    text: Any
    logit_score: Any = None
    lm_score: Any = None
    word_offsets: Any = None


def ctc_beam_search(log_probs: np.ndarray, blank_id: int, beam_width: int = 8):
    """Prefix beam search over [T, V] log-probs; returns (best_ids, score).

    Standard CTC prefix merging: a prefix's probability splits into
    ending-in-blank and ending-in-token mass (Graves 2012)."""
    T, V = log_probs.shape
    # beams: prefix tuple -> (p_blank, p_nonblank) in log space
    NEG = -math.inf
    beams = {(): (0.0, NEG)}

    def logsum(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    for t in range(T):
        row = log_probs[t]
        # only expand the top tokens for tractability
        top = np.argsort(row)[-max(beam_width, 4):]
        new = {}
        for prefix, (pb, pnb) in beams.items():
            total = logsum(pb, pnb)
            for v in top:
                p = float(row[v])
                if v == blank_id:
                    b, nb = new.get(prefix, (NEG, NEG))
                    new[prefix] = (logsum(b, total + p), nb)
                elif prefix and v == prefix[-1]:
                    # same token: repeat (no extension) or new after blank
                    b, nb = new.get(prefix, (NEG, NEG))
                    new[prefix] = (b, logsum(nb, pnb + p))
                    ext = prefix + (int(v),)
                    b2, nb2 = new.get(ext, (NEG, NEG))
                    new[ext] = (b2, logsum(nb2, pb + p))
                else:
                    ext = prefix + (int(v),)
                    b2, nb2 = new.get(ext, (NEG, NEG))
                    new[ext] = (b2, logsum(nb2, total + p))
        beams = dict(sorted(new.items(),
                            key=lambda kv: -logsum(*kv[1]))[:beam_width])
    best, (pb, pnb) = max(beams.items(), key=lambda kv: logsum(*kv[1]))
    return list(best), logsum(pb, pnb)


class Wav2Vec2ProcessorWithLM:
    """feature_extractor + tokenizer + CTC beam decoder."""

    def __init__(self, feature_extractor, tokenizer, decoder=None):
        self.feature_extractor = feature_extractor
        self.tokenizer = tokenizer
        self.decoder = decoder  # optional pyctcdecode BeamSearchDecoderCTC

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        from ...tokenization.auto import AutoTokenizer
        from ..wav2vec2.feature_extraction_wav2vec2 import (
            Wav2Vec2FeatureExtractor,
        )

        fe = Wav2Vec2FeatureExtractor.from_pretrained(path)
        tok = AutoTokenizer.from_pretrained(path)
        decoder = None
        try:  # pragma: no cover - pyctcdecode not baked into this image
            from pyctcdecode import BeamSearchDecoderCTC

            decoder = BeamSearchDecoderCTC.load_from_dir(path)
        except Exception:  # noqa: BLE001
            pass
        return cls(fe, tok, decoder)

    def save_pretrained(self, save_directory):
        self.feature_extractor.save_pretrained(save_directory)
        self.tokenizer.save_pretrained(save_directory)
        if self.decoder is not None:
            self.decoder.save_to_dir(save_directory)

    def __call__(self, audio=None, text=None, **kwargs):
        if audio is not None:
            return self.feature_extractor(audio, **kwargs)
        return self.tokenizer(text, **kwargs)

    # ------------------------------------------------------------- decoding
    def _vocab_list(self):
        vocab = self.tokenizer.get_vocab()
        out = [""] * len(vocab)
        for tok, idx in vocab.items():
            out[idx] = tok
        return out

    def decode(self, logits, beam_width: int = 8, **kwargs):
        logits = np.asarray(logits)
        if logits.ndim == 3:
            logits = logits[0]
        logp = logits - _logsumexp(logits)
        if self.decoder is not None:  # pragma: no cover
            out = self.decoder.decode_beams(logp, beam_width=beam_width)[0]
            return Wav2Vec2DecoderWithLMOutput(
                text=out[0], logit_score=out[-2], lm_score=out[-1])
        blank = self.tokenizer.pad_token_id
        ids, score = ctc_beam_search(logp, blank, beam_width)
        text = self.tokenizer.decode(ids, group_tokens=False,
                                     skip_special_tokens=True) \
            if hasattr(self.tokenizer, "decode") else ""
        return Wav2Vec2DecoderWithLMOutput(text=text, logit_score=score,
                                           lm_score=score)

    def batch_decode(self, logits, beam_width: int = 8, **kwargs):
        logits = np.asarray(logits)
        outs = [self.decode(l, beam_width=beam_width, **kwargs)
                for l in logits]
        return Wav2Vec2DecoderWithLMOutput(
            text=[o.text for o in outs],
            logit_score=[o.logit_score for o in outs],
            lm_score=[o.lm_score for o in outs])


def _logsumexp(x):
    m = x.max(-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(-1, keepdims=True))
