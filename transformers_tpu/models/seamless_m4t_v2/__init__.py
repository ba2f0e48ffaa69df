from .modeling_seamless_m4t_v2 import (
    SeamlessM4Tv2CodeHifiGan,
    SeamlessM4Tv2Config,
    SeamlessM4Tv2ForSpeechToText,
    SeamlessM4Tv2ForTextToText,
    SeamlessM4Tv2SpeechEncoder,
)
