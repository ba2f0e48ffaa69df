"""SAM-HQ (reference models/sam_hq/)."""
from .modeling_sam_hq import SamHQConfig, SamHQModel
