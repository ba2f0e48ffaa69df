from .configuration_auto import AutoConfig
from .modeling_auto import (
    AutoModel,
    AutoModelForCausalLM,
    AutoModelForImageClassification,
    AutoModelForImageTextToText,
    AutoModelForMaskedLM,
    AutoModelForQuestionAnswering,
    AutoModelForSeq2SeqLM,
    AutoModelForSequenceClassification,
    AutoModelForAudioClassification,
    AutoModelForCTC,
    AutoModelForDocumentQuestionAnswering,
    AutoModelForKeypointDetection,
    AutoModelForKeypointMatching,
    AutoModelForTextToWaveform,
    AutoModelForObjectDetection,
    AutoModelForDepthEstimation,
    AutoModelForVideoClassification,
    AutoModelForVisualQuestionAnswering,
    AutoModelForZeroShotObjectDetection,
    AutoModelForSemanticSegmentation,
    AutoModelForSpeechSeq2Seq,
    AutoModelForTokenClassification,
    AutoModelForVision2Seq,
    AutoModelForZeroShotImageClassification,
)
from .image_processing_auto import AutoImageProcessor
from .processing_auto import AutoProcessor
