"""Moonshine Streaming config (reference
models/moonshine_streaming/configuration_moonshine_streaming.py): the
Moonshine seq2seq geometry with a streaming raw-wave encoder — framed CMVN
input, causal convs, NoPE attention under per-layer asymmetric sliding
windows."""

from __future__ import annotations

from ..moonshine.configuration_moonshine import MoonshineConfig


class MoonshineStreamingConfig(MoonshineConfig):
    model_type = "moonshine_streaming"

    def __init__(self, hidden_size=288, encoder_hidden_size=320,
                 sample_rate=16000, frame_ms=5.0, sliding_windows=None,
                 **kwargs):
        super().__init__(hidden_size=hidden_size, **kwargs)
        self.encoder_hidden_size = encoder_hidden_size
        self.sample_rate = sample_rate
        self.frame_ms = frame_ms
        # (left, right) windows per encoder layer (reference :32)
        if sliding_windows is None:
            sliding_windows = [(16, 4), (16, 4), (16, 0), (16, 0), (16, 4),
                               (16, 4)][: self.encoder_num_hidden_layers]
            while len(sliding_windows) < self.encoder_num_hidden_layers:
                sliding_windows.append((16, 4))
        self.sliding_windows = [list(w) for w in sliding_windows]
