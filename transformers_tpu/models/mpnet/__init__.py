from .modeling_mpnet import (MPNetConfig, MPNetForMaskedLM, MPNetModel,
                             MPNetModelStandalone)
