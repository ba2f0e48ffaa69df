"""Florence-2 parity vs torch: DaViT backbone + projector + BART seq2seq
with image-token scatter, plus greedy generate parity."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg():
    return transformers.Florence2Config(
        vision_config=dict(depths=[1, 1], patch_size=[3, 3],
                           patch_stride=[2, 2], patch_padding=[1, 1],
                           patch_prenorm=[False, True], embed_dim=[16, 32],
                           num_heads=[2, 4], num_groups=[2, 4], window_size=4,
                           projection_dim=32, drop_path_rate=0.0,
                           max_position_embeddings=50),
        text_config=dict(model_type="bart", vocab_size=120, d_model=32,
                         encoder_layers=2, decoder_layers=2,
                         encoder_attention_heads=4, decoder_attention_heads=4,
                         encoder_ffn_dim=64, decoder_ffn_dim=64,
                         max_position_embeddings=128),
        image_token_id=110)


def _inputs():
    rng = np.random.default_rng(0)
    px = rng.random((1, 3, 16, 16)).astype(np.float32)
    # 16px image, two stride-2 stages -> 4x4 feature map -> 1+16 image tokens
    n_img = 17
    ids = np.concatenate([np.full((1, n_img), 110),
                          rng.integers(3, 99, size=(1, 6))], axis=1)
    dec = np.array([[2, 0, 8, 9]])
    return px, ids.astype(np.int64), dec.astype(np.int64)


def test_florence2_parity(tmp_path):
    from transformers_tpu.models.florence2 import Florence2ForConditionalGeneration

    torch.manual_seed(0)
    tm = transformers.Florence2ForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "florence2")
    tm.save_pretrained(d, safe_serialization=True)

    m = Florence2ForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    px, ids, dec = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px),
                 decoder_input_ids=torch.from_numpy(dec))
    out = m(m.params, input_ids=jnp.asarray(ids),
            pixel_values=jnp.asarray(px), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4


def test_florence2_generate_parity(tmp_path):
    from transformers_tpu.models.florence2 import Florence2ForConditionalGeneration

    torch.manual_seed(1)
    tm = transformers.Florence2ForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "florence2g")
    tm.save_pretrained(d, safe_serialization=True)
    m = Florence2ForConditionalGeneration.from_pretrained(d, dtype="float32")

    px, ids, _ = _inputs()
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.from_numpy(ids),
                          pixel_values=torch.from_numpy(px),
                          max_new_tokens=8, do_sample=False)
    got = m.generate(m.params, input_ids=jnp.asarray(ids),
                     pixel_values=jnp.asarray(px), max_new_tokens=8)
    got = np.asarray(got)[0].tolist()
    want = ref[0].tolist()
    assert got[:len(want)] == want, (got, want)
