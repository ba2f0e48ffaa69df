from .modeling_table_transformer import (
    TableTransformerConfig,
    TableTransformerForObjectDetection,
    TableTransformerModelStandalone,
)
