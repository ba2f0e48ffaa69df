"""Module-level CDMoE parity: the full-model torch oracle is unusable for
is_moe=True (reference DogeCDMoE returns a tuple into dropout), so the
product-key retrieval block is checked directly against the torch module."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def test_doge_cdmoe_module_parity():
    import torch
    import transformers
    from transformers.models.doge.modeling_doge import DogeCDMoE

    from transformers_tpu.models.doge.modeling_doge import (
        DogeCDMoE as OurCDMoE,
        DogeConfig,
    )

    torch.manual_seed(0)
    cfg = transformers.DogeConfig(hidden_size=32, intermediate_size=64,
                                  num_experts=16, num_experts_per_tok=4,
                                  norm_topk_prob=True)
    tmod = DogeCDMoE(cfg).eval()
    ours = OurCDMoE(DogeConfig(hidden_size=32, intermediate_size=64,
                               num_experts=16, num_experts_per_tok=4,
                               norm_topk_prob=True),
                    dtype=jnp.float32, param_dtype=jnp.float32)
    params = ours.init(jax.random.PRNGKey(0))
    sd = tmod.state_dict()
    # our Linear stores [in, out] (the loader transposes torch layout)
    params["gate_proj"]["weight"] = jnp.asarray(sd["gate_proj.weight"].numpy().T)
    params["up_proj"]["weight"] = jnp.asarray(sd["up_proj.weight"].numpy().T)
    params["down_proj"]["weight"] = jnp.asarray(sd["down_proj.weight"].numpy().T)
    params["router_gate"]["weight"] = jnp.asarray(sd["router_gate.weight"].numpy().T)
    params["down_embed"]["weight"] = jnp.asarray(sd["down_embed.weight"].numpy())
    params["up_embed"]["weight"] = jnp.asarray(sd["up_embed.weight"].numpy())

    x = torch.randn(2, 5, 32)
    with torch.no_grad():
        ref = tmod(x)
        if isinstance(ref, tuple):
            ref = ref[0]
    out = ours(params, jnp.asarray(x.numpy()))
    assert max_abs_diff(out, ref.numpy()) < 5e-5


def test_doge_keep_window_topk_parity(tmp_path):
    """Full-model parity through the top-k keep-window branch. The fresh-init
    A=0 makes all dynamic gates exactly 1.0 (tie-broken arbitrarily by
    torch.topk), so A is randomized before saving the oracle checkpoint."""
    import torch
    import transformers

    import transformers_tpu as ttpu

    torch.manual_seed(3)
    cfg = transformers.DogeConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        keep_window_size=4, pad_token_id=0, eos_token_id=2, bos_token_id=1,
        attn_implementation="eager")
    tm = transformers.DogeForCausalLM(cfg).eval()
    with torch.no_grad():
        for layer in tm.model.layers:
            layer.self_attn.A.normal_(0.0, 1.0)
    d = str(tmp_path / "doge_topk")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3, 22, 7, 14, 2]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 3e-5
