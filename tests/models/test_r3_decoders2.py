"""Round-3 batch 2 decoder/encoder families — parity vs the reference source
tree (v5.15-dev) through the subprocess oracle: ministral3, hyperclovax,
nanochat, eurobert."""

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

FAMILIES = {
    "ministral3": ("Ministral3Config", "Ministral3ForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=128,
        rope_parameters={"rope_type": "yarn", "rope_theta": 10000.0,
                         "factor": 2.0, "original_max_position_embeddings": 4,
                         "max_position_embeddings": 128,
                         "beta_fast": 32.0, "beta_slow": 1.0,
                         "mscale_all_dim": 1.0, "mscale": 1.0,
                         "llama_4_scaling_beta": 0.1}), ""),
    "hyperclovax": ("HyperCLOVAXConfig", "HyperCLOVAXForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=2.0, logits_scaling=3.0, residual_multiplier=0.5,
        attention_multiplier=0.3, use_post_norm=True,
        max_position_embeddings=128), ""),
    "nanochat": ("NanoChatConfig", "NanoChatForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128), ""),
    "cohere2_moe": ("Cohere2MoeConfig", "Cohere2MoeForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, num_shared_experts=1,
        shared_expert_combination_strategy="average",
        expert_selection_fn="sigmoid", first_k_dense_replace=1,
        prefix_dense_intermediate_size=48, rms_norm_eps=1e-5,
        sliding_window=4, sliding_window_pattern=2, logit_scale=0.0625,
        max_position_embeddings=128), ""),
    "granitemoe_swa": ("GraniteMoeSWAConfig", "GraniteMoeSWAForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, shared_intermediate_size=24,
        embedding_multiplier=2.0, logits_scaling=3.0, residual_multiplier=0.5,
        attention_multiplier=0.3, sliding_window=4,
        layer_rope_theta=[10000.0, 0, 10000.0, 500000.0],
        max_position_embeddings=128),
     "for l in m.model.layers:\n"
     "    torch.nn.init.normal_(l.self_attn.sinks)\n"),
}


def _oracle_build(tmp_path, family):
    cfg_cls, model_cls, cfg, extra = FAMILIES[family]
    d = str(tmp_path / family)
    out = reference_run(f"""
from transformers import {cfg_cls}, {model_cls}
cfg = {cfg_cls}(**{cfg!r})
m = {model_cls}(cfg).eval()
{extra}
m.save_pretrained({d!r}, safe_serialization=True)
ids = torch.tensor({IDS!r})
with torch.no_grad():
    logits = m(ids).logits
outputs = {{"logits": logits}}
""")
    return d, out["logits"]


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_logit_parity(family, tmp_path):
    d, ref = _oracle_build(tmp_path, family)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    out = m(m.params, input_ids=jnp.asarray(np.asarray(IDS)))
    diff = max_abs_diff(out.logits, ref)
    assert diff < 3e-5, f"{family}: logit diff {diff}"


def test_eurobert_masked_lm(tmp_path):
    d = str(tmp_path / "eurobert")
    ids = [[4, 17, 9, 3, 22, 7, 14, 2], [5, 12, 9, 3, 1, 1, 1, 1]]
    mask = (np.asarray(ids) != 1).astype(int).tolist()
    out = reference_run(f"""
from transformers import EuroBertConfig, EuroBertForMaskedLM
cfg = EuroBertConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128,
                     bos_token_id=0, eos_token_id=2, pad_token_id=1,
                     mask_token_id=3)
m = EuroBertForMaskedLM(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
ids = torch.tensor({ids!r})
am = torch.tensor({mask!r})
with torch.no_grad():
    logits = m(ids, attention_mask=am).logits
outputs = {{"logits": logits}}
""")
    from transformers_tpu.models.eurobert import EuroBertForMaskedLM

    m = EuroBertForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    got = m(m.params, input_ids=jnp.asarray(np.asarray(ids)),
            attention_mask=jnp.asarray(np.asarray(mask))).logits
    ref = out["logits"]
    # only positions valid under the mask are meaningful
    diff = np.abs(np.asarray(got) - ref)
    assert diff[0].max() < 3e-5 and diff[1, :4].max() < 3e-5


def test_eurobert_sequence_classification_poolings(tmp_path):
    for pooling in ("late", "mean", "bos"):
        d = str(tmp_path / f"eb_{pooling}")
        ids = [[4, 17, 9, 3], [5, 12, 9, 3]]
        out = reference_run(f"""
from transformers import EuroBertConfig
from transformers.models.eurobert.modeling_eurobert import EuroBertForSequenceClassification
cfg = EuroBertConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128,
                     bos_token_id=0, eos_token_id=2, pad_token_id=1,
                     mask_token_id=3, num_labels=3,
                     classifier_pooling={pooling!r})
m = EuroBertForSequenceClassification(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
ids = torch.tensor({ids!r})
with torch.no_grad():
    logits = m(ids, attention_mask=torch.ones_like(ids)).logits
outputs = {{"logits": logits}}
""")
        from transformers_tpu.models.eurobert import EuroBertForSequenceClassification

        m = EuroBertForSequenceClassification.from_pretrained(d, dtype="float32")
        got = m(m.params, input_ids=jnp.asarray(np.asarray(ids)),
                attention_mask=jnp.ones((2, 4), jnp.int32)).logits
        assert max_abs_diff(got, out["logits"]) < 3e-5, pooling
