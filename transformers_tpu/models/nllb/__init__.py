"""NLLB (reference models/nllb): the checkpoints are M2M-100 architecture;
the reference directory carries only the NLLB tokenizer, which our
tokenizer.json engine (tokenization/engine.py) interprets directly."""
from ..m2m_100.modeling_m2m_100 import (M2M100ForConditionalGeneration as
                                        NllbForConditionalGeneration)
from ..m2m_100.modeling_m2m_100 import M2M100Model as NllbModel
