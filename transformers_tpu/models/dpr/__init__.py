from .modeling_dpr import (DPRConfig, DPRContextEncoder, DPRQuestionEncoder,
                           DPRReader)
