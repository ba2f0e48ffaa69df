from .modeling_splinter import (SplinterConfig, SplinterForQuestionAnswering,
                                SplinterModel, SplinterModelStandalone)
