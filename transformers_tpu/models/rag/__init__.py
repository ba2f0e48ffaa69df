from .configuration_rag import RagConfig
from .modeling_rag import (
    RagModel,
    RagRetriever,
    RagSequenceForGeneration,
    RagTokenForGeneration,
)
