"""LayoutLM parity vs torch + document-question-answering pipeline."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=128,
            # must cover the 0-1000 box range (+the [1000]*4 SEP box)
            max_2d_position_embeddings=1024)

IDS = np.array([[2, 5, 9, 3, 7, 11, 4, 6]], dtype=np.int64)
BBOX = np.array([[[0, 0, 0, 0], [10, 10, 40, 20], [42, 10, 60, 20], [0, 30, 20, 40],
                  [22, 30, 50, 40], [52, 30, 80, 40], [10, 50, 30, 60], [0, 0, 0, 0]]],
                dtype=np.int64)


def make_tiny(tmp_dir, cls_name):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LayoutLMConfig(**TINY, attn_implementation="eager")
    tm = getattr(transformers, cls_name)(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_qa_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "layoutlm")
    tm = make_tiny(d, "LayoutLMForQuestionAnswering")
    m = ttpu.AutoModelForDocumentQuestionAnswering.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), bbox=torch.tensor(BBOX))
    out = m(m.params, input_ids=jnp.asarray(IDS), bbox=jnp.asarray(BBOX))
    assert max_abs_diff(out.start_logits, ref.start_logits.numpy()) < 3e-5
    assert max_abs_diff(out.end_logits, ref.end_logits.numpy()) < 3e-5


def test_base_model_parity(tmp_path):
    import torch

    d = str(tmp_path / "layoutlm_base")
    tm = make_tiny(d, "LayoutLMModel")
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), bbox=torch.tensor(BBOX)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), bbox=jnp.asarray(BBOX))
    assert max_abs_diff(out.last_hidden_state, ref) < 3e-5


def test_document_qa_pipeline(tmp_path):
    """Drive the pipeline end-to-end with a WordPiece tokenizer + word boxes."""
    import transformers

    d = str(tmp_path / "docqa")
    make_tiny(d, "LayoutLMForQuestionAnswering")
    # reuse a real (tiny) bert tokenizer from the torch side
    tok = transformers.BertTokenizer(vocab_file=None) if False else None
    # build a minimal vocab.txt checkpoint
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "what", "is", "the",
             "total", "amount", "42", "dollars", "invoice"]
    (Path(d) / "vocab.txt").write_text("\n".join(vocab))
    (Path(d) / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "BertTokenizer", "do_lower_case": true}')

    pipe = ttpu.pipeline("document-question-answering", model=d)
    word_boxes = [("invoice", [10, 10, 100, 30]), ("total", [10, 40, 60, 60]),
                  ("42", [70, 40, 90, 60]), ("dollars", [95, 40, 150, 60])]
    out = pipe(image=None, question="what is the total amount",
               word_boxes=word_boxes, max_answer_len=3)
    assert "answer" in out and isinstance(out["answer"], str) and out["answer"]
    assert 0 <= out["start"] <= out["end"] < len(word_boxes)
