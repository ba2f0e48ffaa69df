from .modeling_textnet import (
    TextNetConfig,
    TextNetForImageClassification,
    TextNetModel,
    TextNetModelStandalone,
)
