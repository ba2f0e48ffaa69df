from .configuration_colpali import ColPaliConfig
from .modeling_colpali import ColPaliForRetrieval
from .processing_colpali import ColPaliProcessor
