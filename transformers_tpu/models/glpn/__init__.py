from .configuration_glpn import GLPNConfig
from .modeling_glpn import (
    GLPNForDepthEstimation,
    GLPNModelStandalone,
)
