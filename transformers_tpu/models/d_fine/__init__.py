from .configuration_d_fine import DFineConfig
from .modeling_d_fine import DFineForObjectDetection, DFineModel
