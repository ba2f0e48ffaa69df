from .configuration_glpn import GLPNConfig
from .modeling_glpn import (
    GLPNForDepthEstimation,
    GLPNModelStandalone,
)
from .image_processing_glpn import GLPNImageProcessor
