"""EncoderDecoder (bert2bert) parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.fixture(scope="module")
def b2b_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("bert2bert"))
    torch.manual_seed(0)
    enc = transformers.BertConfig(vocab_size=99, hidden_size=32,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=64)
    dec = transformers.BertConfig(vocab_size=99, hidden_size=48,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=64,
                                  is_decoder=True, add_cross_attention=True)
    cfg = transformers.EncoderDecoderConfig.from_encoder_decoder_configs(enc, dec)
    cfg._attn_implementation = "eager"
    tm = transformers.EncoderDecoderModel(cfg).eval()
    tm.config.decoder_start_token_id = 2
    tm.config.pad_token_id = 0
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


IDS = np.array([[5, 9, 11, 3, 7]], dtype=np.int64)
MASK = np.ones_like(IDS)
DEC = np.array([[2, 8, 4]], dtype=np.int64)


def test_forward_parity(b2b_ckpt):
    import torch

    d, tm = b2b_ckpt
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS),
            attention_mask=jnp.asarray(MASK), decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_parity(b2b_ckpt):
    import torch

    d, tm = b2b_ckpt
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(IDS),
                          attention_mask=torch.tensor(MASK), max_new_tokens=6,
                          do_sample=False, decoder_start_token_id=2,
                          pad_token_id=0, eos_token_id=None).numpy()
    out = np.asarray(m.generate(m.params, input_ids=jnp.asarray(IDS),
                                attention_mask=jnp.asarray(MASK),
                                max_new_tokens=6, decoder_start_token_id=2,
                                eos_token_id=-1))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])


def test_speech_encoder_decoder_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    enc = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(8, 8), conv_stride=(4, 4), conv_kernel=(8, 8),
        num_feat_extract_layers=2, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, do_stable_layer_norm=False,
        feat_extract_norm="group")
    dec = transformers.BertConfig(vocab_size=99, hidden_size=48,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=64,
                                  is_decoder=True, add_cross_attention=True)
    cfg = transformers.SpeechEncoderDecoderConfig.from_encoder_decoder_configs(enc, dec)
    cfg._attn_implementation = "eager"
    tm = transformers.SpeechEncoderDecoderModel(cfg).eval()
    tm.config.decoder_start_token_id = 2
    tm.config.pad_token_id = 0
    d = str(tmp_path / "sed")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    wav = np.random.default_rng(0).standard_normal((1, 400)).astype(np.float32)
    dec_ids = np.array([[2, 8, 4]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(wav),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(wav),
            decoder_input_ids=jnp.asarray(dec_ids))
    assert max_abs_diff(out.logits, ref) < 5e-5
