from .modeling_vivit import (VivitConfig, VivitForVideoClassification,
                             VivitModel)
