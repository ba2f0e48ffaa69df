from .configuration_utils import GenerationConfig
from .logits_process import (
    LogitsProcessorList,
    MinPLogitsWarper,
    NoRepeatNGramLogitsProcessor,
    RepetitionPenaltyLogitsProcessor,
    TemperatureLogitsWarper,
    TopKLogitsWarper,
    TopPLogitsWarper,
)
from .utils import GenerationMixin
from .beam_search import build_beam_search_fn
from .stopping_criteria import (
    EosTokenCriteria,
    MaxLengthCriteria,
    MaxTimeCriteria,
    StoppingCriteria,
    StoppingCriteriaList,
    StopStringCriteria,
)
from .streamers import (AsyncTextIteratorStreamer, BaseStreamer,
                        TextIteratorStreamer, TextStreamer)
from .watermarking import (SynthIDTextWatermarkDetector,
                           SynthIDTextWatermarkLogitsProcessor,
                           WatermarkDetector, WatermarkLogitsProcessor)
