from .configuration_moonshine_streaming import MoonshineStreamingConfig
from .modeling_moonshine_streaming import (
    MoonshineStreamingForConditionalGeneration,
    MoonshineStreamingModel,
)
