from .modeling_wav2vec2_bert import (
    Wav2Vec2BertConfig,
    Wav2Vec2BertForCTC,
    Wav2Vec2BertModel,
    Wav2Vec2BertModelStandalone,
)
from .processing_wav2vec2_bert import Wav2Vec2BertProcessor
