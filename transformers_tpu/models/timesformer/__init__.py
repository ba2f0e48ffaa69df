from .modeling_timesformer import (TimesformerConfig,
                                   TimesformerForVideoClassification,
                                   TimesformerModel)
