from .processing_wav2vec2_with_lm import (
    Wav2Vec2DecoderWithLMOutput,
    Wav2Vec2ProcessorWithLM,
)
