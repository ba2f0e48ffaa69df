"""T5 parity tests vs torch reference."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

T5_TINY = dict(vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_heads=4, relative_attention_num_buckets=8,
               relative_attention_max_distance=16)


@pytest.fixture(scope="module", params=["relu", "gated-gelu"])
def t5_ckpt(request, tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp(f"t5_{request.param.replace('-', '_')}"))
    torch.manual_seed(0)
    tie = request.param == "relu"  # v1.0 tied, v1.1 untied
    config = transformers.T5Config(**T5_TINY, feed_forward_proj=request.param, decoder_start_token_id=0,
                                   tie_word_embeddings=tie, attn_implementation="eager")
    tm = transformers.T5ForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


IDS = np.array([[5, 9, 3, 22, 7, 1], [4, 8, 15, 1, 0, 0]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], dtype=np.int64)
DEC = np.array([[0, 11, 13], [0, 7, 9]], dtype=np.int64)


def test_forward_logit_parity(t5_ckpt):
    import torch

    d, tm = t5_ckpt
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
                decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_cached_decode_matches_full(t5_ckpt):
    d, _ = t5_ckpt
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    dec = np.array([[0, 11, 13, 7, 9, 2]], dtype=np.int64)
    full = model(model.params, input_ids=jnp.asarray(IDS[:1]), attention_mask=jnp.asarray(MASK[:1]),
                 decoder_input_ids=jnp.asarray(dec))
    enc = model.encode(model.params, jnp.asarray(IDS[:1]), jnp.asarray(MASK[:1]))
    cross_kv = model.precompute_cross_kv(model.params, enc.last_hidden_state)
    cache = model.init_decoder_cache(1, 6, dtype=jnp.float32)
    mask = np.zeros((1, 6), np.int64)
    for t in range(6):
        mask[:, t] = 1
        hidden, cache = model.decode_step(model.params, jnp.asarray(dec[:, t : t + 1]),
                                          cross_kv, cache, t, jnp.asarray(mask),
                                          jnp.asarray(MASK[:1]))
        logits = model.compute_logits(model.params, hidden)
        assert max_abs_diff(logits[:, 0], full.logits[:, t]) < 1e-4, f"step {t}"


def test_greedy_generate_matches_torch(t5_ckpt):
    import torch

    d, tm = t5_ckpt
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                          max_new_tokens=8, do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK), max_new_tokens=8))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])


def test_train_loss(t5_ckpt):
    import torch

    d, tm = t5_ckpt
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    labels = np.array([[11, 13, 7], [7, 9, 2]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 labels=torch.tensor(labels)).loss.item()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
                labels=jnp.asarray(labels))
    assert abs(float(out.loss) - ref) < 1e-4


def test_mt5_routes_to_t5_skeleton(tmp_path):
    """model_type 'mt5' (gated-gelu T5) loads through the t5 skeleton."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.MT5Config(vocab_size=99, d_model=32, d_kv=8, d_ff=64,
                                 num_layers=2, num_decoder_layers=2, num_heads=4,
                                 relative_attention_num_buckets=8,
                                 decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)
    tm = transformers.MT5ForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "mt5")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    ids = np.array([[3, 17, 9, 42]])
    dec = np.array([[0, 5, 7]])
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), decoder_input_ids=jnp.asarray(dec)).logits
    assert np.abs(np.asarray(out) - ref).max() < 3e-5
