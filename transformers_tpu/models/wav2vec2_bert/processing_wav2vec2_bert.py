"""Wav2Vec2-BERT processor (reference
models/wav2vec2_bert/processing_wav2vec2_bert.py): SeamlessM4T fbank tier +
CTC tokenizer."""

from __future__ import annotations

from ..wav2vec2.processing_wav2vec2 import Wav2Vec2Processor


class Wav2Vec2BertProcessor(Wav2Vec2Processor):
    pass
