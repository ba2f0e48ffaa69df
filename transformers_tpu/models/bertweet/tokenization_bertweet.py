"""BERTweet tokenizer (reference models/bertweet/tokenization_bertweet.py):
fairseq vocab.txt + bpe.codes subword-nmt BPE. Tweet normalization
(user/url/emoji folding, :52-101) applies before BPE when enabled."""

from __future__ import annotations

import re

from ...tokenization.fairseq_bpe import FairseqBpeTokenizer


class BertweetTokenizer(FairseqBpeTokenizer):
    def __init__(self, vocab_file, merges_file, normalization=False, **kwargs):
        super().__init__(vocab_file, merges_file, **kwargs)
        self.normalization = normalization

    def normalize_tweet(self, text: str) -> str:
        text = re.sub(r"(?:@[\w_]+)", "@USER", text)
        text = re.sub(r"https?://\S+|www\.\S+", "HTTPURL", text)
        return text

    def tokenize(self, text):
        if self.normalization:
            text = self.normalize_tweet(text)
        return super().tokenize(text)
