"""pipeline() factory + task registry.

TPU-native analog of reference src/transformers/pipelines/__init__.py:387
(``pipeline``), :141 (``SUPPORTED_TASKS``), :136 (``TASK_ALIASES``),
:323 (``check_task``).
"""

from __future__ import annotations

from typing import Optional

from ..utils import logging
from .base import Pipeline
from .tasks import (
    AutomaticSpeechRecognitionPipeline,
    QuestionAnsweringPipeline,
    SummarizationPipeline,
    AudioClassificationPipeline,
    DepthEstimationPipeline,
    VideoClassificationPipeline,
    ZeroShotObjectDetectionPipeline,
    ImageSegmentationPipeline,
    ObjectDetectionPipeline,
    ImageFeatureExtractionPipeline,
    Text2TextGenerationPipeline,
    TranslationPipeline,
    ZeroShotClassificationPipeline,
    FeatureExtractionPipeline,
    FillMaskPipeline,
    ImageClassificationPipeline,
    ImageTextToTextPipeline,
    ImageToTextPipeline,
    VisualQuestionAnsweringPipeline,
    TextClassificationPipeline,
    TextGenerationPipeline,
    DocumentQuestionAnsweringPipeline,
    KeypointMatchingPipeline,
    TextToAudioPipeline,
    ZeroShotAudioClassificationPipeline,
    MaskGenerationPipeline,
    TokenClassificationPipeline,
    ZeroShotImageClassificationPipeline,
    AnyToAnyPipeline,
    TableQuestionAnsweringPipeline,
)

logger = logging.get_logger(__name__)

# task -> (pipeline class, auto-model attr, needs)
SUPPORTED_TASKS = {
    "table-question-answering": (TableQuestionAnsweringPipeline,
                                 "AutoModelForTableQuestionAnswering", ("tokenizer",)),
    "any-to-any": (AnyToAnyPipeline, "AutoModelForCausalLM", ("processor",)),
    "text-generation": (TextGenerationPipeline, "AutoModelForCausalLM", ("tokenizer",)),
    "text-classification": (TextClassificationPipeline, "AutoModelForSequenceClassification", ("tokenizer",)),
    "token-classification": (TokenClassificationPipeline, "AutoModelForTokenClassification", ("tokenizer",)),
    "fill-mask": (FillMaskPipeline, "AutoModelForMaskedLM", ("tokenizer",)),
    "feature-extraction": (FeatureExtractionPipeline, "AutoModel", ("tokenizer",)),
    "image-classification": (ImageClassificationPipeline, "AutoModelForImageClassification", ("image_processor",)),
    "zero-shot-image-classification": (ZeroShotImageClassificationPipeline,
                                       "AutoModelForZeroShotImageClassification",
                                       ("tokenizer", "image_processor")),
    "automatic-speech-recognition": (AutomaticSpeechRecognitionPipeline,
                                     "AutoModelForSpeechSeq2Seq",
                                     ("tokenizer", "feature_extractor")),
    "image-text-to-text": (ImageTextToTextPipeline, "AutoModelForImageTextToText", ("processor",)),
    "question-answering": (QuestionAnsweringPipeline, "AutoModelForQuestionAnswering", ("tokenizer",)),
    "zero-shot-classification": (ZeroShotClassificationPipeline,
                                 "AutoModelForSequenceClassification", ("tokenizer",)),
    "text2text-generation": (Text2TextGenerationPipeline, "AutoModelForSeq2SeqLM", ("tokenizer",)),
    "summarization": (SummarizationPipeline, "AutoModelForSeq2SeqLM", ("tokenizer",)),
    "image-to-text": (ImageToTextPipeline, "AutoModelForVision2Seq", ("processor",)),
    "visual-question-answering": (VisualQuestionAnsweringPipeline,
                                  "AutoModelForVisualQuestionAnswering", ("processor",)),
    "zero-shot-object-detection": (ZeroShotObjectDetectionPipeline,
                                   "AutoModelForZeroShotObjectDetection",
                                   ("tokenizer", "image_processor")),
    "video-classification": (VideoClassificationPipeline, "AutoModelForVideoClassification",
                             ("video_processor",)),
    "depth-estimation": (DepthEstimationPipeline, "AutoModelForDepthEstimation",
                         ("image_processor",)),
    "image-segmentation": (ImageSegmentationPipeline, "AutoModelForSemanticSegmentation",
                           ("image_processor",)),
    "object-detection": (ObjectDetectionPipeline, "AutoModelForObjectDetection",
                         ("image_processor",)),
    "audio-classification": (AudioClassificationPipeline,
                             "AutoModelForAudioClassification", ("feature_extractor",)),
    "image-feature-extraction": (ImageFeatureExtractionPipeline, "AutoModel", ("image_processor",)),
    "translation": (TranslationPipeline, "AutoModelForSeq2SeqLM", ("tokenizer",)),
    "document-question-answering": (DocumentQuestionAnsweringPipeline,
                                    "AutoModelForDocumentQuestionAnswering", ("tokenizer",)),
    "mask-generation": (MaskGenerationPipeline, "AutoModel", ("image_processor",)),
    "keypoint-matching": (KeypointMatchingPipeline, "AutoModelForKeypointMatching",
                          ("image_processor",)),
    "text-to-audio": (TextToAudioPipeline, "AutoModelForTextToWaveform", ("tokenizer",)),
    "zero-shot-audio-classification": (ZeroShotAudioClassificationPipeline, "AutoModel",
                                       ("tokenizer", "feature_extractor")),
}

TASK_ALIASES = {
    "text-to-speech": "text-to-audio",
    "sentiment-analysis": "text-classification",
    "ner": "token-classification",
    "vqa": "visual-question-answering",
}


def check_task(task: str):
    task = TASK_ALIASES.get(task, task)
    if task not in SUPPORTED_TASKS:
        raise KeyError(f"Unknown task {task!r}. Available: {sorted(SUPPORTED_TASKS)}")
    return task, SUPPORTED_TASKS[task]


def pipeline(
    task: str,
    model=None,
    tokenizer=None,
    image_processor=None,
    feature_extractor=None,
    processor=None,
    dtype="auto",
    **kwargs,
) -> Pipeline:
    """reference pipelines/__init__.py:387."""
    import transformers_tpu as ttpu

    task, (pipeline_cls, auto_attr, needs) = check_task(task)

    model_path = None
    if isinstance(model, str):
        model_path = model
        auto_cls = getattr(ttpu, auto_attr)
        model = auto_cls.from_pretrained(model, dtype=dtype)
    if model is None:
        raise ValueError(f"pipeline({task!r}) requires a model path or instance "
                         "(no default checkpoints without network access)")
    src = model_path or getattr(model.config, "_name_or_path", None)
    if "tokenizer" in needs and tokenizer is None and src:
        tokenizer = ttpu.AutoTokenizer.from_pretrained(src)
    if "image_processor" in needs and image_processor is None and src:
        image_processor = ttpu.AutoImageProcessor.from_pretrained(src)
    if "feature_extractor" in needs and feature_extractor is None and src:
        from ..models.whisper import WhisperFeatureExtractor

        from ..feature_extraction_utils import AutoFeatureExtractor

        feature_extractor = AutoFeatureExtractor.from_pretrained(src)
    if "processor" in needs and processor is None and src:
        processor = ttpu.AutoProcessor.from_pretrained(src)
    video_processor = kwargs.pop("video_processor", None)
    if "video_processor" in needs and video_processor is None and src:
        from ..video_processing_utils import AutoVideoProcessor

        video_processor = AutoVideoProcessor.from_pretrained(src)
    return pipeline_cls(model=model, tokenizer=tokenizer, image_processor=image_processor,
                        feature_extractor=feature_extractor, processor=processor,
                        video_processor=video_processor, **kwargs)
