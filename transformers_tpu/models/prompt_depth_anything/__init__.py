from .modeling_prompt_depth_anything import (
    PromptDepthAnythingConfig,
    PromptDepthAnythingForDepthEstimation,
)
