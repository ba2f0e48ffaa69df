"""Parakeet parity vs the reference source tree (subprocess oracle):
FastConformer encoder, CTC logits + greedy, RNNT joint logits + RNNT loss,
TDT joint logits + TDT loss, greedy transducer decode."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402
from ref_oracle import reference_run  # noqa: E402

ENC = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
           intermediate_size=64, conv_kernel_size=5, subsampling_factor=4,
           subsampling_conv_channels=8, num_mel_bins=16,
           dropout=0.0, dropout_positions=0.0, layerdrop=0.0,
           activation_dropout=0.0, attention_dropout=0.0)

rng = np.random.default_rng(0)
FEATS = rng.standard_normal((2, 40, 16)).astype(np.float32)
MASK = np.ones((2, 40), np.int64)
MASK[1, 30:] = 0


def test_ctc_forward_and_greedy(tmp_path):
    d = str(tmp_path / "ctc")
    np.save(tmp_path / "f.npy", FEATS)
    np.save(tmp_path / "m.npy", MASK)
    out = reference_run(f"""
from transformers import ParakeetCTCConfig, ParakeetForCTC, ParakeetEncoderConfig
import numpy as np
cfg = ParakeetCTCConfig(encoder_config=ParakeetEncoderConfig(**{ENC!r}),
                        vocab_size=33, pad_token_id=32)
m = ParakeetForCTC(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
feats = torch.tensor(np.load({str(tmp_path / 'f.npy')!r}))
mask = torch.tensor(np.load({str(tmp_path / 'm.npy')!r}))
with torch.no_grad():
    logits = m(feats, attention_mask=mask).logits
    seq = m.generate(feats, attention_mask=mask)
outputs = {{"logits": logits, "seq": seq}}
""")
    from transformers_tpu.models.parakeet import ParakeetForCTC

    m = ParakeetForCTC.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    got = m(m.params, jnp.asarray(FEATS), attention_mask=jnp.asarray(MASK))
    ref = out["logits"]
    # padded frames diverge (masked); compare valid region per row
    valid = m._subsampling_output_length(MASK.sum(-1))
    for i, v in enumerate(valid):
        assert max_abs_diff(got.logits[i, :v], ref[i, :v]) < 5e-5, i
    seq = np.asarray(m.generate(m.params, jnp.asarray(FEATS),
                                attention_mask=jnp.asarray(MASK)))
    assert np.array_equal(seq, out["seq"])


@pytest.mark.parametrize("kind", ["rnnt", "tdt"])
def test_transducer_logits_and_loss(tmp_path, kind):
    d = str(tmp_path / kind)
    np.save(tmp_path / "f.npy", FEATS)
    np.save(tmp_path / "m.npy", MASK)
    cfg_cls = "ParakeetRNNTConfig" if kind == "rnnt" else "ParakeetTDTConfig"
    model_cls = "ParakeetForRNNT" if kind == "rnnt" else "ParakeetForTDT"
    out = reference_run(f"""
from transformers import ParakeetEncoderConfig
from transformers import {cfg_cls}, {model_cls}
import numpy as np
cfg = {cfg_cls}(encoder_config=ParakeetEncoderConfig(**{ENC!r}),
                vocab_size=17, blank_token_id=16, pad_token_id=2,
                decoder_hidden_size=24, num_decoder_layers=2)
m = {model_cls}(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
feats = torch.tensor(np.load({str(tmp_path / 'f.npy')!r}))
mask = torch.tensor(np.load({str(tmp_path / 'm.npy')!r}))
dec_ids = torch.tensor([[16, 4, 7, 9], [16, 3, 5, 16]])
with torch.no_grad():
    o = m(feats, attention_mask=mask, decoder_input_ids=dec_ids)
outputs = {{"logits": o.logits}}
""")
    import transformers_tpu.models.parakeet as mod

    m = getattr(mod, model_cls).from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    dec_ids = jnp.asarray([[16, 4, 7, 9], [16, 3, 5, 16]])
    labels = jnp.asarray([[4, 7, 9], [3, 5, 16]])
    got = m(m.params, jnp.asarray(FEATS), attention_mask=jnp.asarray(MASK),
            decoder_input_ids=dec_ids, labels=labels)
    ref = out["logits"]
    valid = m._subsampling_output_length(MASK.sum(-1))
    for i, v in enumerate(valid):
        assert max_abs_diff(got.logits[i, :v], ref[i, :v]) < 5e-5, i
    # the reference cannot compute transducer losses here (torchaudio absent);
    # loss numerics are parity-tested in tests/losses/test_transducer.py —
    # assert the wiring produces a finite scalar
    assert np.isfinite(float(got.loss)), float(got.loss)


def test_rnnt_greedy_decode(tmp_path):
    d = str(tmp_path / "gen")
    np.save(tmp_path / "f.npy", FEATS)
    np.save(tmp_path / "m.npy", MASK)
    out = reference_run(f"""
from transformers import ParakeetEncoderConfig, ParakeetRNNTConfig, ParakeetForRNNT
import numpy as np
cfg = ParakeetRNNTConfig(encoder_config=ParakeetEncoderConfig(**{ENC!r}),
                         vocab_size=17, blank_token_id=16, pad_token_id=2,
                         decoder_hidden_size=24, num_decoder_layers=2,
                         decoder_start_token_id=16)
m = ParakeetForRNNT(cfg).eval()
m.save_pretrained({d!r}, safe_serialization=True)
feats = torch.tensor(np.load({str(tmp_path / 'f.npy')!r}))
mask = torch.tensor(np.load({str(tmp_path / 'm.npy')!r}))
with torch.no_grad():
    gen = m.generate(feats, attention_mask=mask)
outputs = {{"seq": gen.sequences, "durations": gen.durations}}
""")
    from transformers_tpu.models.parakeet import ParakeetForRNNT

    m = ParakeetForRNNT.from_pretrained(d, dtype="float32")
    got = np.asarray(m.generate(m.params, jnp.asarray(FEATS),
                                attention_mask=jnp.asarray(MASK)))
    ref = np.asarray(out["seq"])
    durations = np.asarray(out["durations"])
    blank, start, pad = 16, 16, 2
    lengths = m._subsampling_output_length(MASK.sum(-1))
    # reference generate keeps emitting for exhausted rows until the whole
    # batch stops; keep only tokens emitted while the row's encoder frames
    # remained (frame index = cumsum of per-step advances)
    frames = np.cumsum(durations, axis=1) - durations  # frame at emission time
    for i in range(got.shape[0]):
        g = [t for t in got[i] if t != pad]
        r = [int(t) for t, f in zip(ref[i], frames[i])
             if f < lengths[i] and t not in (blank, start, pad)]
        assert g == r, (i, g, r)
