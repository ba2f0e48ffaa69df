"""RT-DETRv2 config (reference src/transformers/models/rt_detr_v2/configuration_rt_detr_v2.py)."""

from __future__ import annotations

from ..rt_detr.configuration_rt_detr import RTDetrConfig


class RTDetrV2Config(RTDetrConfig):
    model_type = "rt_detr_v2"

    def __init__(self, decoder_n_levels=3, decoder_offset_scale=0.5,
                 decoder_method="default", **kwargs):
        self.decoder_n_levels = decoder_n_levels
        self.decoder_offset_scale = decoder_offset_scale
        self.decoder_method = decoder_method
        super().__init__(**kwargs)
