"""RAG parity vs torch: token- and sequence-level doc marginalization over a
DPR question encoder + BART generator, with the in-memory retriever."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

N_DOCS = 3


def _cfg():
    q = dict(model_type="dpr", vocab_size=120, hidden_size=32,
             num_hidden_layers=2, num_attention_heads=4,
             intermediate_size=64, projection_dim=0,
             max_position_embeddings=64)
    g = dict(model_type="bart", vocab_size=120, d_model=32, encoder_layers=2,
             decoder_layers=2, encoder_attention_heads=4,
             decoder_attention_heads=4, encoder_ffn_dim=64,
             decoder_ffn_dim=64, max_position_embeddings=64)
    return transformers.RagConfig(question_encoder=q, generator=g,
                                  n_docs=N_DOCS, retrieval_vector_size=32)


def _inputs():
    rng = np.random.default_rng(0)
    ctx = rng.integers(3, 110, size=(1 * N_DOCS, 9)).astype(np.int64)
    cam = np.ones_like(ctx)
    scores = rng.standard_normal((1, N_DOCS)).astype(np.float32)
    dec = np.array([[2, 0, 8, 9, 1]], np.int64)
    return ctx, cam, scores, dec


@pytest.mark.parametrize("variant", ["token", "sequence"])
def test_rag_parity(tmp_path, variant):
    from transformers_tpu.models.rag import (
        RagSequenceForGeneration,
        RagTokenForGeneration,
    )

    torch.manual_seed(0)
    tcls = (transformers.RagTokenForGeneration if variant == "token"
            else transformers.RagSequenceForGeneration)
    ocls = (RagTokenForGeneration if variant == "token"
            else RagSequenceForGeneration)
    tm = tcls(_cfg()).eval()
    d = str(tmp_path / f"rag_{variant}")
    tm.save_pretrained(d, safe_serialization=True)

    m = ocls.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ctx, cam, scores, dec = _inputs()
    with torch.no_grad():
        ref = tm(context_input_ids=torch.from_numpy(ctx),
                 context_attention_mask=torch.from_numpy(cam),
                 doc_scores=torch.from_numpy(scores),
                 decoder_input_ids=torch.from_numpy(dec),
                 labels=torch.from_numpy(dec),
                 **({"do_marginalize": True} if variant == "token" else {}))
    out = m(m.params, context_input_ids=jnp.asarray(ctx),
            context_attention_mask=jnp.asarray(cam),
            doc_scores=jnp.asarray(scores), decoder_input_ids=jnp.asarray(dec),
            labels=jnp.asarray(dec),
            **({"do_marginalize": True} if variant == "token" else {}))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4
    np.testing.assert_allclose(np.asarray(out.loss), ref.loss.numpy(),
                               atol=2e-3, rtol=1e-4)


def test_rag_retriever_end_to_end(tmp_path):
    import jax

    from transformers_tpu.models.rag import RagRetriever, RagTokenForGeneration
    from transformers_tpu.models.rag.configuration_rag import RagConfig

    q = dict(model_type="dpr", vocab_size=120, hidden_size=32,
             num_hidden_layers=2, num_attention_heads=4,
             intermediate_size=64, projection_dim=0,
             max_position_embeddings=64)
    g = dict(model_type="bart", vocab_size=120, d_model=32, encoder_layers=2,
             decoder_layers=2, encoder_attention_heads=4,
             decoder_attention_heads=4, encoder_ffn_dim=64,
             decoder_ffn_dim=64, max_position_embeddings=64)
    cfg = RagConfig(question_encoder=q, generator=g, n_docs=2)
    rng = np.random.default_rng(1)
    retriever = RagRetriever(
        doc_embeds=rng.standard_normal((6, 32)).astype(np.float32),
        context_input_ids=rng.integers(3, 110, size=(6, 7)))
    m = RagTokenForGeneration(cfg, dtype=jnp.float32, retriever=retriever)
    params = m.init(jax.random.key(0))
    ids = np.array([[4, 9, 11, 2]], np.int64)
    dec = np.array([[2, 0, 8]], np.int64)
    out = m(params, input_ids=jnp.asarray(ids),
            decoder_input_ids=jnp.asarray(dec), do_marginalize=True)
    assert out.logits.shape == (1, 3, 120)
    assert out.doc_scores.shape == (1, 2)
    assert out.retrieved_doc_ids.shape == (1, 2)
    assert np.isfinite(np.asarray(out.logits)).all()
