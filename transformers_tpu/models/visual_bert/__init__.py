from .modeling_visual_bert import (
    VisualBertConfig,
    VisualBertForPreTraining,
    VisualBertModel,
    VisualBertModelStandalone,
)
