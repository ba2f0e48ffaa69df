from .activations import ACT2FN, get_activation
from .attention import ALL_ATTENTION_FUNCTIONS, AttentionInterface, eager_attention, get_attention_fn
from .masks import make_causal_bias, position_ids_from_mask
from .rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
