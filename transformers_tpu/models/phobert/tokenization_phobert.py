"""PhoBERT tokenizer (reference models/phobert/tokenization_phobert.py):
same fairseq vocab.txt + bpe.codes BPE as BERTweet over pre-word-segmented
Vietnamese text."""

from ...tokenization.fairseq_bpe import FairseqBpeTokenizer


class PhobertTokenizer(FairseqBpeTokenizer):
    pass
