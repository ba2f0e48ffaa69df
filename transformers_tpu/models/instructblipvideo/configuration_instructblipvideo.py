"""InstructBLIP-Video config (reference
models/instructblipvideo/configuration_instructblipvideo.py): InstructBlip
with a video token and 4-frame inputs."""

from __future__ import annotations

from ..instructblip.configuration_instructblip import InstructBlipConfig


class InstructBlipVideoConfig(InstructBlipConfig):
    model_type = "instructblipvideo"

    def __init__(self, video_token_index=None, **kwargs):
        super().__init__(**kwargs)
        self.video_token_index = video_token_index
        self.video_token_id = video_token_index
