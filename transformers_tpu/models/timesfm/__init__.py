from .configuration_timesfm import TimesFmConfig
from .modeling_timesfm import (TimesFmModel, TimesFmModelForPrediction,
                               TimesFmOutputForPrediction)
