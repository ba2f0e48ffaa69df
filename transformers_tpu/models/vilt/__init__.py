from .modeling_vilt import (
    ViltConfig,
    ViltForMaskedLM,
    ViltForQuestionAnswering,
    ViltModel,
    ViltModelStandalone,
)
