"""MVP parity vs torch: BART layout + layer-wise prompts (lightweight tuning)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[0, 14, 25, 36, 7, 2], [0, 9, 11, 2, 1, 1]], np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], np.int64)
DEC = np.array([[2, 0, 5, 8], [2, 0, 3, 4]], np.int64)


def _cfg(transformers, **kw):
    return transformers.MvpConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=48, decoder_ffn_dim=48, max_position_embeddings=64,
        prompt_length=3, prompt_mid_dim=16, forced_eos_token_id=None, **kw)


def _save(tmp_path, tm, name):
    d = str(tmp_path / name)
    tm.save_pretrained(d, safe_serialization=True)
    return d


def test_conditional_generation_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.MvpForConditionalGeneration(_cfg(transformers)).eval()
    d = _save(tmp_path, tm, "mvp")
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 decoder_input_ids=torch.from_numpy(DEC)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            decoder_input_ids=jnp.asarray(DEC))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    rt = tm.generate(torch.from_numpy(IDS), attention_mask=torch.from_numpy(MASK),
                     max_new_tokens=6, do_sample=False, num_beams=1)
    ours = m.generate(m.params, input_ids=jnp.asarray(IDS),
                      attention_mask=jnp.asarray(MASK), max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(ours)[:, : rt.shape[1]],
                                  rt.numpy()[:, : np.asarray(ours).shape[1]])


def test_prompt_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.MvpForConditionalGeneration(
        _cfg(transformers, use_prompt=True)).eval()
    d = _save(tmp_path, tm, "mvp_p")
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 decoder_input_ids=torch.from_numpy(DEC)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            decoder_input_ids=jnp.asarray(DEC))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    rt = tm.generate(torch.from_numpy(IDS), attention_mask=torch.from_numpy(MASK),
                     max_new_tokens=6, do_sample=False, num_beams=1)
    ours = m.generate(m.params, input_ids=jnp.asarray(IDS),
                      attention_mask=jnp.asarray(MASK), max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(ours)[:, : rt.shape[1]],
                                  rt.numpy()[:, : np.asarray(ours).shape[1]])


def test_sequence_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(2)
    tm = transformers.MvpForSequenceClassification(
        _cfg(transformers, num_labels=3)).eval()
    d = _save(tmp_path, tm, "mvp_sc")
    m = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5


def test_question_answering_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(3)
    tm = transformers.MvpForQuestionAnswering(_cfg(transformers)).eval()
    d = _save(tmp_path, tm, "mvp_qa")
    m = ttpu.AutoModelForQuestionAnswering.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out.start_logits) - ref.start_logits.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.end_logits) - ref.end_logits.numpy()).max() < 5e-5


def test_bart_heads_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(4)
    cfg = transformers.BartConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=48, decoder_ffn_dim=48, max_position_embeddings=64,
        num_labels=3, forced_eos_token_id=None)
    tm = transformers.BartForSequenceClassification(cfg).eval()
    d = _save(tmp_path, tm, "bart_sc")
    m = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    tm2 = transformers.BartForQuestionAnswering(cfg).eval()
    d2 = _save(tmp_path, tm2, "bart_qa")
    m2 = ttpu.AutoModelForQuestionAnswering.from_pretrained(d2, dtype="float32")
    assert not m2.load_report.missing_keys, m2.load_report.missing_keys
    with torch.no_grad():
        ref2 = tm2(input_ids=torch.from_numpy(IDS),
                   attention_mask=torch.from_numpy(MASK))
    out2 = m2(m2.params, input_ids=jnp.asarray(IDS),
              attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out2.start_logits) - ref2.start_logits.numpy()).max() < 5e-5
