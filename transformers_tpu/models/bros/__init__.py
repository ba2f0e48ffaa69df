from .configuration_bros import BrosConfig
from .modeling_bros import (
    BrosForTokenClassification,
    BrosModel,
    BrosSpadeEEForTokenClassification,
    BrosSpadeELForTokenClassification,
)
from .processing_bros import BrosProcessor
