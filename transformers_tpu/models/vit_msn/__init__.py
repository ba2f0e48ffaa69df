from .modeling_vit_msn import (ViTMSNConfig, ViTMSNForImageClassification,
                               ViTMSNModelStandalone)
