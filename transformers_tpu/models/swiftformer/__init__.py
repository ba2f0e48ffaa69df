from .modeling_swiftformer import (
    SwiftFormerConfig,
    SwiftFormerForImageClassification,
    SwiftFormerModel,
    SwiftFormerModelStandalone,
)
