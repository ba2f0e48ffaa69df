"""Encoder-variant parity suite: Ernie, RoFormer, FNet, RemBERT,
MegatronBERT — MLM logit parity vs torch on tiny random checkpoints."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 0, 0, 0, 0]], dtype=np.int64)
MASK = np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.int64)

FAMILIES = {
    "ernie": ("ErnieConfig", "ErnieForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64)),
    "ernie-task": ("ErnieConfig", "ErnieForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, use_task_id=True)),
    "roformer": ("RoFormerConfig", "RoFormerForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, embedding_size=32)),
    "roformer-rotval": ("RoFormerConfig", "RoFormerForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, embedding_size=32,
        rotary_value=True)),
    "fnet": ("FNetConfig", "FNetForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, intermediate_size=64,
        max_position_embeddings=64)),
    "rembert": ("RemBertConfig", "RemBertForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, input_embedding_size=16, output_embedding_size=24,
        max_position_embeddings=64)),
    "megatron-bert": ("MegatronBertConfig", "MegatronBertForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64)),
    # pure renames of the roberta skeleton (reference modular_camembert.py /
    # modular_xlm_roberta.py)
    "camembert": ("CamembertConfig", "CamembertForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, pad_token_id=1)),
    "xlm-roberta": ("XLMRobertaConfig", "XLMRobertaForMaskedLM", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, pad_token_id=1)),
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_mlm_logit_parity(family, tmp_path):
    import torch
    import transformers

    cfg_name, arch_name, cfg = FAMILIES[family]
    torch.manual_seed(0)
    config = getattr(transformers, cfg_name)(**cfg, attn_implementation="eager")
    tm = getattr(transformers, arch_name)(config).eval()
    d = str(tmp_path / family)
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        if family == "fnet":  # FNet takes no attention mask
            ref = tm(input_ids=torch.tensor(IDS)).logits.numpy()
            out = m(m.params, input_ids=jnp.asarray(IDS)).logits
        else:
            ref = tm(input_ids=torch.tensor(IDS),
                     attention_mask=torch.tensor(MASK)).logits.numpy()
            out = m(m.params, input_ids=jnp.asarray(IDS),
                    attention_mask=jnp.asarray(MASK)).logits
    assert max_abs_diff(out, ref) < 5e-5, family
