"""Parity for BertGeneration, RoBERTa-PreLayerNorm, Splinter, DPR vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.bert_generation import (BertGenerationDecoder,  # noqa: E402
                                                     BertGenerationEncoder)
from transformers_tpu.models.dpr import (DPRContextEncoder,  # noqa: E402
                                         DPRQuestionEncoder, DPRReader)
from transformers_tpu.models.roberta_prelayernorm import \
    RobertaPreLayerNormForMaskedLM  # noqa: E402
from transformers_tpu.models.splinter import \
    SplinterForQuestionAnswering  # noqa: E402

RNG = np.random.default_rng(0)
TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64)
IDS = np.array([[2, 17, 9, 42, 7, 11]], dtype=np.int64)


def test_bert_generation_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.BertGenerationConfig(**TINY)
    tm = transformers.BertGenerationEncoder(cfg).eval()
    d = str(tmp_path / "bg")
    tm.save_pretrained(d, safe_serialization=True)
    m = BertGenerationEncoder.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.last_hidden_state, ref) < 5e-5

    # decoder variant: causal mask + tied lm head
    dcfg = transformers.BertGenerationConfig(**TINY, is_decoder=True)
    tdm = transformers.BertGenerationDecoder(dcfg).eval()
    d2 = str(tmp_path / "bgd")
    tdm.save_pretrained(d2, safe_serialization=True)
    m2 = BertGenerationDecoder.from_pretrained(d2, dtype="float32")
    with torch.no_grad():
        ref2 = tdm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out2 = m2(m2.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out2.logits, ref2) < 5e-5


def test_roberta_prelayernorm_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.RobertaPreLayerNormConfig(**TINY, pad_token_id=0)
    tm = transformers.RobertaPreLayerNormForMaskedLM(cfg).eval()
    d = str(tmp_path / "rpln")
    tm.save_pretrained(d, safe_serialization=True)
    m = RobertaPreLayerNormForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_splinter_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.SplinterConfig(**TINY, question_token_id=4)
    tm = transformers.SplinterForQuestionAnswering(cfg).eval()
    d = str(tmp_path / "splinter")
    tm.save_pretrained(d, safe_serialization=True)
    m = SplinterForQuestionAnswering.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 4, 9, 42, 7, 11]], dtype=np.int64)  # [QUESTION] at pos 1
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask))
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.start_logits, ref.start_logits.numpy()) < 5e-5
    assert max_abs_diff(out.end_logits, ref.end_logits.numpy()) < 5e-5


def test_dpr_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.DPRConfig(**TINY, projection_dim=16)
    tq = transformers.DPRQuestionEncoder(cfg).eval()
    tc = transformers.DPRContextEncoder(cfg).eval()
    tr = transformers.DPRReader(transformers.DPRConfig(**TINY)).eval()
    dq, dc, dr = str(tmp_path / "q"), str(tmp_path / "c"), str(tmp_path / "r")
    tq.save_pretrained(dq, safe_serialization=True)
    tc.save_pretrained(dc, safe_serialization=True)
    tr.save_pretrained(dr, safe_serialization=True)

    mq = DPRQuestionEncoder.from_pretrained(dq, dtype="float32")
    assert not mq.load_report.missing_keys, mq.load_report.missing_keys
    with torch.no_grad():
        ref = tq(input_ids=torch.from_numpy(IDS)).pooler_output.numpy()
    out = mq(mq.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.pooler_output, ref) < 5e-5

    mc = DPRContextEncoder.from_pretrained(dc, dtype="float32")
    with torch.no_grad():
        refc = tc(input_ids=torch.from_numpy(IDS)).pooler_output.numpy()
    outc = mc(mc.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(outc.pooler_output, refc) < 5e-5

    mr = DPRReader.from_pretrained(dr, dtype="float32")
    with torch.no_grad():
        refr = tr(input_ids=torch.from_numpy(IDS))
    outr = mr(mr.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(outr.start_logits, refr.start_logits.numpy()) < 5e-5
    assert max_abs_diff(outr.relevance_logits, refr.relevance_logits.numpy()) < 5e-5
