from .modeling_camembert import (CamembertConfig, CamembertForMaskedLM,
                                 CamembertForQuestionAnswering,
                                 CamembertForSequenceClassification,
                                 CamembertModel, CamembertModelStandalone)
