"""DAC config (reference src/transformers/models/dac/configuration_dac.py)."""

from __future__ import annotations

import numpy as np

from ...configuration_utils import PretrainedConfig


class DacConfig(PretrainedConfig):
    model_type = "dac"

    def __init__(self, encoder_hidden_size=64, downsampling_ratios=(2, 4, 8, 8),
                 decoder_hidden_size=1536, n_codebooks=9, codebook_size=1024,
                 codebook_dim=8, quantizer_dropout=0.0,
                 commitment_loss_weight=0.25, codebook_loss_weight=1.0,
                 sampling_rate=16000, **kwargs):
        self.encoder_hidden_size = encoder_hidden_size
        self.downsampling_ratios = list(downsampling_ratios)
        self.decoder_hidden_size = decoder_hidden_size
        self.n_codebooks = n_codebooks
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.quantizer_dropout = quantizer_dropout
        self.commitment_loss_weight = commitment_loss_weight
        self.codebook_loss_weight = codebook_loss_weight
        self.sampling_rate = sampling_rate
        self.upsampling_ratios = self.downsampling_ratios[::-1]
        self.hidden_size = encoder_hidden_size * (2 ** len(self.downsampling_ratios))
        self.hop_length = int(np.prod(self.upsampling_ratios))
        super().__init__(**kwargs)
