from .modeling_markuplm import (
    MarkupLMConfig,
    MarkupLMForQuestionAnswering,
    MarkupLMForSequenceClassification,
    MarkupLMForTokenClassification,
    MarkupLMModel,
    MarkupLMModelStandalone,
)
from .feature_extraction_markuplm import MarkupLMFeatureExtractor
from .processing_markuplm import MarkupLMProcessor
