"""Pop2Piano parity vs torch: T5 over mel-feature inputs_embeds with the
composer-token mel conditioner."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_pop2piano_parity(tmp_path):
    from transformers_tpu.models.pop2piano import Pop2PianoForConditionalGeneration

    torch.manual_seed(0)
    cfg = transformers.Pop2PianoConfig(
        vocab_size=120, composer_vocab_size=5, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_heads=4, dense_act_fn="relu")
    tm = transformers.Pop2PianoForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "pop2piano")
    tm.save_pretrained(d, safe_serialization=True)

    m = Pop2PianoForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 7, 32)).astype(np.float32)
    dec = np.array([[0, 5, 9, 11]], np.int64)
    with torch.no_grad():
        ref = tm(input_features=torch.from_numpy(feats),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_features=jnp.asarray(feats),
            decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 2e-4

    # mel conditioner parity (the generate-path composer prepend)
    with torch.no_grad():
        cond_ref = tm.mel_conditioner(
            feature=torch.from_numpy(feats),
            index_value=torch.tensor([3]), embedding_offset=2).numpy()
    cond = np.asarray(m.condition_features(
        m.params, feats, np.array([3]), 2)[0])
    assert max_abs_diff(cond, cond_ref) < 1e-6
