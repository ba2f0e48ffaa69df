"""Jina Embeddings V3 + Nomic BERT: post-norm rope encoder behavior.

Covers "jina_embeddings_v3" and "nomic_bert": mask invariance (padding must
not change unmasked positions — exercises the bidirectional mask path),
MLM head shapes, and save/load round-trip determinism.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64)


def _models():
    from transformers_tpu.models.jina_embeddings_v3 import (
        JinaEmbeddingsV3Config,
        JinaEmbeddingsV3ForMaskedLM,
    )
    from transformers_tpu.models.nomic_bert import (
        NomicBertConfig,
        NomicBertForMaskedLM,
    )

    return [(JinaEmbeddingsV3Config, JinaEmbeddingsV3ForMaskedLM),
            (NomicBertConfig, NomicBertForMaskedLM)]


def test_mask_invariance_and_shapes():
    for Cfg, Cls in _models():
        model = Cls(Cfg(**TINY))
        params = model.init(jax.random.PRNGKey(0))
        ids = np.array([[1, 2, 3, 4, 5, 6, 0, 0]])
        mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]])
        out = model(params, input_ids=ids, attention_mask=mask)
        assert out.logits.shape == (1, 8, 99)
        # padded tail must not influence valid positions
        ids2 = ids.copy()
        ids2[0, 6:] = 7  # different pad content
        out2 = model(params, input_ids=ids2, attention_mask=mask)
        np.testing.assert_allclose(np.asarray(out.logits[:, :6]),
                                   np.asarray(out2.logits[:, :6]), atol=1e-5)


def test_roundtrip(tmp_path):
    for Cfg, Cls in _models():
        model = Cls(Cfg(**TINY))
        model.params = model.init(jax.random.PRNGKey(1))
        d = str(tmp_path / Cls.__name__)
        model.save_pretrained(d)
        reloaded = Cls.from_pretrained(d, dtype="float32")
        assert not reloaded.load_report.missing_keys, \
            reloaded.load_report.missing_keys
        ids = np.array([[3, 1, 4, 1, 5, 9, 2, 6]])
        a = model(model.params, input_ids=ids).logits
        b = reloaded(reloaded.params, input_ids=ids).logits
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
