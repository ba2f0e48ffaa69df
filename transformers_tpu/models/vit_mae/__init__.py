from .modeling_vit_mae import (ViTMAEConfig, ViTMAEDecoder,
                               ViTMAEForPreTraining, ViTMAEModel)
