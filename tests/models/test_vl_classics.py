"""Parity vs torch: VisualBERT (and friends)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def test_visual_bert_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.visual_bert import VisualBertForPreTraining

    torch.manual_seed(0)
    cfg = transformers.VisualBertConfig(vocab_size=99, hidden_size=32,
                                        num_hidden_layers=2, num_attention_heads=4,
                                        intermediate_size=64, visual_embedding_dim=16,
                                        max_position_embeddings=64)
    tm = transformers.VisualBertForPreTraining(cfg).eval()
    d = str(tmp_path / "vbert")
    tm.save_pretrained(d, safe_serialization=True)
    m = VisualBertForPreTraining.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    vis = np.random.default_rng(0).normal(size=(1, 4, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 visual_embeds=torch.from_numpy(vis)).prediction_logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), visual_embeds=jnp.asarray(vis))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_vilt_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.vilt import ViltForMaskedLM

    torch.manual_seed(1)
    cfg = transformers.ViltConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  image_size=32, patch_size=16,
                                  max_position_embeddings=40)
    tm = transformers.ViltForMaskedLM(cfg).eval()
    with torch.no_grad():
        # the sampling path permutes image tokens; text logits are invariant
        tm.vilt.embeddings.cls_token.normal_()
        tm.vilt.embeddings.position_embeddings.normal_()
    d = str(tmp_path / "vilt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ViltForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    px = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    pmask = np.ones((1, 32, 32), np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px),
                 pixel_mask=torch.from_numpy(pmask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(px),
            pixel_mask=jnp.asarray(pmask))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_lxmert_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.lxmert import LxmertForQuestionAnswering

    torch.manual_seed(2)
    cfg = transformers.LxmertConfig(vocab_size=99, hidden_size=32,
                                    num_attention_heads=4, intermediate_size=64,
                                    l_layers=2, x_layers=2, r_layers=2,
                                    visual_feat_dim=16, visual_pos_dim=4,
                                    num_qa_labels=7, max_position_embeddings=64)
    tm = transformers.LxmertForQuestionAnswering(cfg).eval()
    d = str(tmp_path / "lxmert")
    tm.save_pretrained(d, safe_serialization=True)
    m = LxmertForQuestionAnswering.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    rng = np.random.default_rng(2)
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    feats = rng.normal(size=(1, 5, 16)).astype(np.float32)
    pos = rng.uniform(size=(1, 5, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 visual_feats=torch.from_numpy(feats),
                 visual_pos=torch.from_numpy(pos)).question_answering_score.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), visual_feats=jnp.asarray(feats),
            visual_pos=jnp.asarray(pos))
    assert max_abs_diff(out.logits, ref) < 5e-5
