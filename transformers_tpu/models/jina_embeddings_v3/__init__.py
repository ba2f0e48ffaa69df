from .configuration_jina_embeddings_v3 import JinaEmbeddingsV3Config
from .modeling_jina_embeddings_v3 import (
    JinaEmbeddingsV3ForMaskedLM,
    JinaEmbeddingsV3Model,
    JinaEmbeddingsV3ModelStandalone,
)
