"""Xcodec config (reference src/transformers/models/xcodec/configuration_xcodec.py)."""

from __future__ import annotations

import math

import numpy as np

from ...configuration_utils import PretrainedConfig

_DEFAULT_ACOUSTIC_KW = dict(
    encoder_hidden_size=64,
    # the Xcodec checkpoints keep downsampling == upsampling order
    # (reference configuration_xcodec.py:96 notes this quirk)
    downsampling_ratios=[8, 5, 4, 2],
    decoder_hidden_size=1024,
    upsampling_ratios=[8, 5, 4, 2],
    hidden_size=256,
)


class XcodecConfig(PretrainedConfig):
    model_type = "xcodec"
    sub_configs = {"acoustic_model_config": "auto", "semantic_model_config": "auto"}

    def __init__(self, target_bandwidths=None, sample_rate=16000, kernel_size=3,
                 channel_ratios=(1, 1), strides=(1, 1), block_dilations=(1, 1),
                 unit_kernel_size=3, codebook_size=1024, codebook_dim=None,
                 initializer_range=0.02, acoustic_model_config=None,
                 semantic_model_config=None, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if acoustic_model_config is None:
            acoustic_model_config = AutoConfig.for_model_type("dac", **_DEFAULT_ACOUSTIC_KW)
        elif isinstance(acoustic_model_config, dict):
            model_type = acoustic_model_config.get("model_type", "dac")
            merged = {**_DEFAULT_ACOUSTIC_KW,
                      **{k: v for k, v in acoustic_model_config.items() if k != "model_type"}}
            acoustic_model_config = AutoConfig.for_model_type(model_type, **merged)
        if semantic_model_config is None:
            semantic_model_config = AutoConfig.for_model_type("hubert")
        elif isinstance(semantic_model_config, dict):
            model_type = semantic_model_config.get("model_type", "hubert")
            semantic_model_config = AutoConfig.for_model_type(
                model_type, **{k: v for k, v in semantic_model_config.items()
                               if k != "model_type"})
        self.acoustic_model_config = acoustic_model_config
        self.semantic_model_config = semantic_model_config

        self.target_bandwidths = list(target_bandwidths) if target_bandwidths is not None \
            else [0.5, 1, 1.5, 2, 4]
        self.sample_rate = sample_rate
        self.kernel_size = kernel_size
        self.channel_ratios = list(channel_ratios)
        self.strides = list(strides)
        self.block_dilations = list(block_dilations)
        self.unit_kernel_size = unit_kernel_size
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim if codebook_dim is not None else (
            self.acoustic_model_config.hidden_size + self.semantic_model_config.hidden_size)
        self.initializer_range = initializer_range
        super().__init__(**kwargs)

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sample_rate / self.hop_length)

    @property
    def semantic_hidden_size(self) -> int:
        return self.semantic_model_config.hidden_size

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.acoustic_model_config.downsampling_ratios))

    @property
    def codebook_nbits(self) -> int:
        return math.ceil(math.log2(self.codebook_size))

    @property
    def hidden_size(self) -> int:
        return self.acoustic_model_config.hidden_size + self.semantic_model_config.hidden_size

    @property
    def num_quantizers(self) -> int:
        return int(1000 * self.target_bandwidths[-1]
                   // (self.frame_rate * self.codebook_nbits))
