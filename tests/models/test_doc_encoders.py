"""MarkupLM and LiLT parity vs torch transformers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
hf = pytest.importorskip("transformers")

import jax.numpy as jnp

import transformers_tpu as ttpu


def _markuplm_cfg():
    return dict(vocab_size=99, hidden_size=36, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, type_vocab_size=2,
                max_xpath_tag_unit_embeddings=16, max_xpath_subs_unit_embeddings=32,
                tag_pad_id=15, subs_pad_id=31, xpath_unit_hidden_size=8, max_depth=5,
                num_labels=3)


def _lilt_cfg():
    return dict(vocab_size=99, hidden_size=48, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, type_vocab_size=2,
                channel_shrink_ratio=4, max_2d_position_embeddings=64,
                num_labels=3)


def test_markuplm_parity(tmp_path):
    torch.manual_seed(0)
    tm = hf.MarkupLMForTokenClassification(hf.MarkupLMConfig(**_markuplm_cfg())).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = ttpu.AutoModelForTokenClassification.from_pretrained(tmp_path,
                                                                 dtype="float32")
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, (2, 7))
    tags = rng.integers(0, 16, (2, 7, 5))
    subs = rng.integers(0, 32, (2, 7, 5))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), xpath_tags_seq=torch.tensor(tags),
                 xpath_subs_seq=torch.tensor(subs),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    got = np.asarray(model(model.params, input_ids=jnp.asarray(ids),
                           xpath_tags_seq=jnp.asarray(tags),
                           xpath_subs_seq=jnp.asarray(subs),
                           attention_mask=jnp.asarray(mask)).logits)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_markuplm_default_xpath_and_seqcls(tmp_path):
    torch.manual_seed(1)
    tm = hf.MarkupLMForSequenceClassification(hf.MarkupLMConfig(**_markuplm_cfg())).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = ttpu.AutoModelForSequenceClassification.from_pretrained(
        tmp_path, dtype="float32")
    ids = np.array([[2, 5, 17, 42, 9]])
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(model.params, input_ids=jnp.asarray(ids)).logits)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_lilt_parity(tmp_path):
    torch.manual_seed(0)
    tm = hf.LiltForTokenClassification(hf.LiltConfig(**_lilt_cfg())).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = ttpu.AutoModelForTokenClassification.from_pretrained(tmp_path,
                                                                 dtype="float32")
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, (2, 7))
    x0 = rng.integers(0, 30, (2, 7)); y0 = rng.integers(0, 30, (2, 7))
    bbox = np.stack([x0, y0, x0 + rng.integers(0, 30, (2, 7)),
                     y0 + rng.integers(0, 30, (2, 7))], axis=-1)
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), bbox=torch.tensor(bbox),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    got = np.asarray(model(model.params, input_ids=jnp.asarray(ids),
                           bbox=jnp.asarray(bbox),
                           attention_mask=jnp.asarray(mask)).logits)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_lilt_base_and_seqcls(tmp_path):
    torch.manual_seed(1)
    tm = hf.LiltForSequenceClassification(hf.LiltConfig(**_lilt_cfg())).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    model = ttpu.AutoModelForSequenceClassification.from_pretrained(
        tmp_path, dtype="float32")
    ids = np.array([[2, 5, 17, 42, 9, 3]])
    bbox = np.zeros((1, 6, 4), np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), bbox=torch.tensor(bbox)).logits.numpy()
    got = np.asarray(model(model.params, input_ids=jnp.asarray(ids),
                           bbox=jnp.asarray(bbox)).logits)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
