from .modeling_lxmert import (
    LxmertConfig,
    LxmertForQuestionAnswering,
    LxmertModel,
    LxmertModelStandalone,
)
