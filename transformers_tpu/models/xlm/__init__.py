from .modeling_xlm import (XLMConfig, XLMModel, XLMModelStandalone,
                           XLMWithLMHeadModel)
