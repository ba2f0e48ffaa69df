"""Qwen2.5-VL configs (reference
src/transformers/models/qwen2_5_vl/configuration_qwen2_5_vl.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..qwen2_vl.configuration_qwen2_vl import Qwen2VLTextConfig


class Qwen2_5_VLVisionConfig(PretrainedConfig):
    model_type = "qwen2_5_vl"

    def __init__(
        self,
        depth=32,
        hidden_size=3584,
        hidden_act="silu",
        intermediate_size=3420,
        num_heads=16,
        in_channels=3,
        patch_size=14,
        spatial_merge_size=2,
        temporal_patch_size=2,
        tokens_per_second=4,
        window_size=112,
        out_hidden_size=3584,
        fullatt_block_indexes=(7, 15, 23, 31),
        initializer_range=0.02,
        **kwargs,
    ):
        self.depth = depth
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.intermediate_size = intermediate_size
        self.num_heads = num_heads
        self.in_channels = in_channels
        self.patch_size = patch_size
        self.spatial_merge_size = spatial_merge_size
        self.temporal_patch_size = temporal_patch_size
        self.tokens_per_second = tokens_per_second
        self.window_size = window_size
        self.out_hidden_size = out_hidden_size
        self.fullatt_block_indexes = list(fullatt_block_indexes)
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Qwen2_5_VLTextConfig(Qwen2VLTextConfig):
    model_type = "qwen2_5_vl_text"


class Qwen2_5_VLConfig(PretrainedConfig):
    model_type = "qwen2_5_vl"
    sub_configs = {"vision_config": Qwen2_5_VLVisionConfig, "text_config": Qwen2_5_VLTextConfig}

    def __init__(self, text_config=None, vision_config=None, image_token_id=151655,
                 video_token_id=151656, vision_start_token_id=151652,
                 vision_end_token_id=151653, **kwargs):
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Qwen2_5_VLVisionConfig(**(vision_config or {}))
        if isinstance(text_config, dict) or text_config is None:
            text_fields = dict(text_config or {})
            for k in list(kwargs):
                if k in ("vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers",
                         "num_attention_heads", "num_key_value_heads", "rope_theta",
                         "rms_norm_eps", "rope_scaling", "max_position_embeddings"):
                    text_fields.setdefault(k, kwargs.pop(k))
            text_config = Qwen2_5_VLTextConfig(**text_fields)
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.vision_end_token_id = vision_end_token_id
        super().__init__(**kwargs)
