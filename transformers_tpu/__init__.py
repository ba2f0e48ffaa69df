"""transformers_tpu — a TPU-native model framework (JAX/XLA/Pallas/pjit).

Brand-new implementation of the huggingface/transformers capability surface,
designed TPU-first: functional param-pytree models, static-shape jitted
generation, Pallas kernels for the hot ops, and declarative sharding plans
compiled to jax.sharding PartitionSpecs. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from .cache_utils import StaticKVCache, cache_from_config, init_static_cache
from .configuration_utils import PretrainedConfig
from .generation import GenerationConfig, GenerationMixin
from .modeling_utils import PreTrainedModel
from .image_processing_utils import BaseImageProcessor, BatchFeature
from .models.auto import (
    AutoConfig,
    AutoImageProcessor,
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
    AutoModelForTableQuestionAnswering,
    AutoModelForTextToSpectrogram,
    AutoModelForTextToWaveform,
    AutoModelForObjectDetection,
    AutoModelForDepthEstimation,
    AutoModelForTimeSeriesPrediction,
    AutoModelForVideoClassification,
    AutoModelForVisualQuestionAnswering,
    AutoModelForZeroShotObjectDetection,
    AutoModelForSemanticSegmentation,
    AutoModelForSpeechSeq2Seq,
    AutoModelForTokenClassification,
    AutoModelForVision2Seq,
    AutoModelForZeroShotImageClassification,
)
from .models.llama import LlamaConfig, LlamaForCausalLM
from .tokenization import AutoTokenizer, BatchEncoding, PreTrainedTokenizer
from .utils import logging
from .generation import AsyncTextIteratorStreamer, TextIteratorStreamer, TextStreamer
from .optimization import create_optimizer, get_scheduler
from .trainer import Trainer
from .trainer_seq2seq import Seq2SeqTrainer, Seq2SeqTrainingArguments
from .trainer_callback import (
    DefaultFlowCallback,
    EarlyStoppingCallback,
    PrinterCallback,
    TrainerCallback,
    TrainerControl,
    TrainerState,
)
from .trainer_jit_checkpoint import JITCheckpointCallback
from .training_args import ParallelismConfig, TrainingArguments
from .data.data_collator import (
    DataCollatorForLanguageModeling,
    DataCollatorForSeq2Seq,
    DataCollatorForWholeWordMask,
    DataCollatorWithFlattening,
    DataCollatorWithPadding,
    default_data_collator,
)
from .models.auto import AutoProcessor
from .processing_utils import ProcessorMixin
from .pipelines import Pipeline, pipeline
from .quantizers import Fp8WeightOnlyConfig, Int4WeightOnlyConfig, Int8WeightOnlyConfig, quantize_params
from .peft import (
    lora_optimizer,
    LoraConfig,
    init_lora_params,
    load_adapter,
    lora_trainable_mask,
    merge_lora,
    save_adapter,
)
from .debug_utils import DebugUnderflowOverflow, detect_overflow, model_addition_debugger_context, tree_stats
from .hf_argparser import HfArgumentParser
from .video_processing_utils import AutoVideoProcessor, BaseVideoProcessor
