"""NemotronH parity via the reference-source oracle: four-way block pattern
(mamba2 SSD / NoPE attention / relu2 MLP / non-gated MoE)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402
from ref_oracle import reference_run  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = [[1, 5, 9, 3, 22, 7, 14, 2]]

CFG = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
           layers_block_type=["linear_attention", "full_attention", "mlp", "moe"],
           num_attention_heads=4, num_key_value_heads=2, head_dim=8,
           ssm_state_size=8, mamba_num_heads=4, mamba_head_dim=16, n_groups=2,
           conv_kernel=4, chunk_size=8, n_routed_experts=4,
           num_experts_per_tok=2, moe_intermediate_size=32,
           moe_shared_expert_intermediate_size=32, max_position_embeddings=128)

CFG_LATENT = dict(CFG, moe_latent_size=16)


@pytest.mark.parametrize("cfg", [CFG, CFG_LATENT], ids=["base", "latent-proj"])
def test_logit_parity(cfg, tmp_path):
    d = str(tmp_path / "nh")
    out = reference_run(f"""
from transformers import NemotronHConfig, NemotronHForCausalLM
cfg = NemotronHConfig(**{cfg!r}, use_mamba_kernels=False)
m = NemotronHForCausalLM(cfg).eval()
for b in m.model.layers:
    if hasattr(b.mixer, "gate"):
        torch.nn.init.normal_(b.mixer.gate.e_score_correction_bias)
m.save_pretrained({d!r}, safe_serialization=True)
ids = torch.tensor({IDS!r})
with torch.no_grad():
    logits = m(ids).logits
outputs = {{"logits": logits}}
""")
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ours = m(m.params, input_ids=jnp.asarray(np.asarray(IDS)))
    diff = max_abs_diff(ours.logits, out["logits"])
    assert diff < 5e-5, f"logit diff {diff}"


def test_cached_decode_matches_full(tmp_path):
    d = str(tmp_path / "nh")
    reference_run(f"""
from transformers import NemotronHConfig, NemotronHForCausalLM
cfg = NemotronHConfig(**{CFG!r}, use_mamba_kernels=False)
m = NemotronHForCausalLM(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
outputs = {{}}
""")
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.asarray(IDS, np.int32)
    full = m(m.params, input_ids=jnp.asarray(ids)).logits
    cache = m.init_cache(1, 16)
    mask = np.zeros((1, 16), np.int32)
    mask[:, :4] = 1
    out = m(m.params, input_ids=jnp.asarray(ids[:, :4]),
            attention_mask=jnp.asarray(mask), past_key_values=cache,
            cache_position=0)
    assert max_abs_diff(out.logits, full[:, :4]) < 1e-4
    cache = out.past_key_values
    for t in range(4, 8):
        mask[:, t] = 1
        step = m(m.params, input_ids=jnp.asarray(ids[:, t:t + 1]),
                 attention_mask=jnp.asarray(mask),
                 position_ids=jnp.asarray([[t]]), past_key_values=cache,
                 cache_position=t)
        cache = step.past_key_values
        assert max_abs_diff(step.logits[:, 0], full[:, t]) < 1e-4, f"step {t}"
