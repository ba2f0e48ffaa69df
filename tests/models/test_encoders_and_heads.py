"""Encoder (BERT/RoBERTa) + task-head parity vs torch transformers."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

ENC_TINY = dict(
    vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
)


def save_torch(tmp_dir, cls_name, config_name, cfg, seed=0):
    import torch
    import transformers

    torch.manual_seed(seed)
    config = getattr(transformers, config_name)(**cfg, attn_implementation="eager")
    model = getattr(transformers, cls_name)(config)
    model.eval()
    model.save_pretrained(tmp_dir, safe_serialization=True)
    return model


def run_torch(model, **inputs):
    import torch

    with torch.no_grad():
        return model(**{k: torch.tensor(v) for k, v in inputs.items()})


IDS = np.array([[2, 5, 9, 3, 22, 7], [4, 8, 15, 16, 1, 1]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], dtype=np.int64)


@pytest.mark.parametrize("family,config_name", [("bert", "BertConfig"), ("roberta", "RobertaConfig")])
def test_masked_lm_parity(family, config_name, tmp_path):
    d = str(tmp_path / family)
    cls = {"bert": "BertForMaskedLM", "roberta": "RobertaForMaskedLM"}[family]
    tm = save_torch(d, cls, config_name, ENC_TINY)
    model = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    # compare only valid positions (masked rows differ under padding)
    diff = max_abs_diff(out.logits[MASK == 1], ref[MASK == 1])
    assert diff < 3e-5, diff


@pytest.mark.parametrize("family,config_name", [("bert", "BertConfig"), ("roberta", "RobertaConfig")])
def test_sequence_classification_parity(family, config_name, tmp_path):
    d = str(tmp_path / family)
    cls = {"bert": "BertForSequenceClassification", "roberta": "RobertaForSequenceClassification"}[family]
    tm = save_torch(d, cls, config_name, {**ENC_TINY, "num_labels": 3})
    model = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 3e-5


def test_bert_token_classification_and_qa(tmp_path):
    d1 = str(tmp_path / "tok")
    tm = save_torch(d1, "BertForTokenClassification", "BertConfig", {**ENC_TINY, "num_labels": 5})
    model = ttpu.AutoModelForTokenClassification.from_pretrained(d1, dtype="float32")
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits[MASK == 1], ref[MASK == 1]) < 3e-5

    d2 = str(tmp_path / "qa")
    tm = save_torch(d2, "BertForQuestionAnswering", "BertConfig", ENC_TINY)
    model = ttpu.AutoModelForQuestionAnswering.from_pretrained(d2, dtype="float32")
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK)
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.start_logits[MASK == 1], ref.start_logits.numpy()[MASK == 1]) < 3e-5


def test_llama_sequence_classification_parity(tmp_path):
    d = str(tmp_path / "llama_cls")
    cfg = dict(vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, num_labels=3, pad_token_id=0)
    tm = save_torch(d, "LlamaForSequenceClassification", "LlamaConfig", cfg)
    model = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 3e-5


def test_llama_qa_parity(tmp_path):
    d = str(tmp_path / "llama_qa")
    cfg = dict(vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, pad_token_id=0)
    tm = save_torch(d, "LlamaForQuestionAnswering", "LlamaConfig", cfg)
    model = ttpu.AutoModelForQuestionAnswering.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK)
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.start_logits[MASK == 1], ref.start_logits.numpy()[MASK == 1]) < 3e-5


DISTIL_TINY = dict(vocab_size=99, dim=32, hidden_dim=64, n_layers=3, n_heads=4,
                   max_position_embeddings=64, dropout=0.0, attention_dropout=0.0)


def test_distilbert_masked_lm_parity(tmp_path):
    d = str(tmp_path / "distilbert")
    tm = save_torch(d, "DistilBertForMaskedLM", "DistilBertConfig", DISTIL_TINY)
    model = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    assert not model.load_report.unexpected_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    diff = max_abs_diff(out.logits[MASK == 1], ref[MASK == 1])
    assert diff < 3e-5, diff


def test_distilbert_sequence_classification_parity(tmp_path):
    d = str(tmp_path / "distilbert_sc")
    tm = save_torch(d, "DistilBertForSequenceClassification", "DistilBertConfig", DISTIL_TINY)
    model = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 3e-5


def test_distilbert_qa_parity(tmp_path):
    d = str(tmp_path / "distilbert_qa")
    tm = save_torch(d, "DistilBertForQuestionAnswering", "DistilBertConfig", DISTIL_TINY)
    model = ttpu.AutoModelForQuestionAnswering.from_pretrained(d, dtype="float32")
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK)
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.start_logits, ref.start_logits.numpy()) < 3e-5
    assert max_abs_diff(out.end_logits, ref.end_logits.numpy()) < 3e-5


def test_xlm_roberta_loads_as_roberta(tmp_path):
    """model_type 'xlm-roberta' routes to the roberta skeleton."""
    d = str(tmp_path / "xlmr")
    tm = save_torch(d, "XLMRobertaForMaskedLM", "XLMRobertaConfig",
                    {**ENC_TINY, "pad_token_id": 1})
    model = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits[MASK == 1], ref[MASK == 1]) < 3e-5


ELECTRA_TINY = dict(vocab_size=99, embedding_size=16, hidden_size=32, num_hidden_layers=3,
                    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
                    type_vocab_size=2)
ALBERT_TINY = dict(vocab_size=99, embedding_size=16, hidden_size=32, num_hidden_layers=4,
                   num_hidden_groups=2, inner_group_num=1, num_attention_heads=4,
                   intermediate_size=64, max_position_embeddings=64)


@pytest.mark.parametrize("cls,arch", [
    ("ElectraForMaskedLM", "AutoModelForMaskedLM"),
    ("ElectraForSequenceClassification", "AutoModelForSequenceClassification"),
    ("ElectraForTokenClassification", None),
])
def test_electra_parity(cls, arch, tmp_path):
    d = str(tmp_path / "electra")
    tm = save_torch(d, cls, "ElectraConfig", ELECTRA_TINY)
    if arch is None:
        from transformers_tpu.models.electra import ElectraForTokenClassification
        model = ElectraForTokenClassification.from_pretrained(d, dtype="float32")
    else:
        model = getattr(ttpu, arch).from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    assert not model.load_report.unexpected_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    if ref.ndim == 3:
        assert max_abs_diff(out.logits[MASK == 1], ref[MASK == 1]) < 3e-5
    else:
        assert max_abs_diff(out.logits, ref) < 3e-5


def test_electra_discriminator_parity(tmp_path):
    d = str(tmp_path / "electra_disc")
    tm = save_torch(d, "ElectraForPreTraining", "ElectraConfig", ELECTRA_TINY)
    from transformers_tpu.models.electra import ElectraForPreTraining
    model = ElectraForPreTraining.from_pretrained(d, dtype="float32")
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits[MASK == 1], ref[MASK == 1]) < 3e-5


@pytest.mark.parametrize("cls,arch", [
    ("AlbertForMaskedLM", "AutoModelForMaskedLM"),
    ("AlbertForSequenceClassification", "AutoModelForSequenceClassification"),
])
def test_albert_parity(cls, arch, tmp_path):
    """Shared layer groups (num_hidden_groups=2 over 4 layers) vs torch."""
    d = str(tmp_path / "albert")
    tm = save_torch(d, cls, "AlbertConfig", ALBERT_TINY)
    model = getattr(ttpu, arch).from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    assert not model.load_report.unexpected_keys
    ref = run_torch(tm, input_ids=IDS, attention_mask=MASK).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    if ref.ndim == 3:
        assert max_abs_diff(out.logits[MASK == 1], ref[MASK == 1]) < 3e-5
    else:
        assert max_abs_diff(out.logits, ref) < 3e-5


MODERNBERT_TINY = dict(vocab_size=99, hidden_size=32, intermediate_size=48,
                       num_hidden_layers=4, num_attention_heads=4,
                       global_attn_every_n_layers=2, local_attention=8,
                       max_position_embeddings=64, pad_token_id=0)
LONG_IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 8, 11, 4, 6, 13]], dtype=np.int64)


@pytest.mark.parametrize("cls,arch,pooling", [
    ("ModernBertForMaskedLM", "AutoModelForMaskedLM", None),
    ("ModernBertForSequenceClassification", "AutoModelForSequenceClassification", "cls"),
    ("ModernBertForSequenceClassification", "AutoModelForSequenceClassification", "mean"),
    ("ModernBertForTokenClassification", None, None),
])
def test_modernbert_parity(cls, arch, pooling, tmp_path):
    """Alternating bidirectional sliding/full layers + dual-theta rotary:
    the 12-token input exceeds the local window (8) so the window mask is
    exercised."""
    d = str(tmp_path / "mbert")
    cfg = dict(MODERNBERT_TINY)
    if pooling:
        cfg["classifier_pooling"] = pooling
    tm = save_torch(d, cls, "ModernBertConfig", cfg)
    if arch is None:
        from transformers_tpu.models.modernbert import ModernBertForTokenClassification
        model = ModernBertForTokenClassification.from_pretrained(d, dtype="float32")
    else:
        model = getattr(ttpu, arch).from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    assert not model.load_report.unexpected_keys
    mask = np.ones_like(LONG_IDS)
    ref = run_torch(tm, input_ids=LONG_IDS, attention_mask=mask).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(LONG_IDS), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 3e-5
