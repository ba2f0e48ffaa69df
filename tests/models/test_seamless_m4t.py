"""SeamlessM4T parity vs torch: text2text (logits + greedy generate),
speech2text (conformer encoder + adapter), unit vocoder waveform."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def _tiny_cfg(transformers):
    return transformers.SeamlessM4TConfig(
        vocab_size=64, t2u_vocab_size=40, hidden_size=32,
        speech_encoder_layers=2, speech_encoder_attention_heads=4,
        speech_encoder_intermediate_size=48, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4, encoder_ffn_dim=48,
        decoder_ffn_dim=48, t2u_encoder_layers=1, t2u_decoder_layers=1,
        t2u_encoder_ffn_dim=48, t2u_decoder_ffn_dim=48,
        t2u_encoder_attention_heads=4, t2u_decoder_attention_heads=4,
        adaptor_kernel_size=3, adaptor_stride=2, num_adapter_layers=1,
        position_embeddings_type="relative", conv_depthwise_kernel_size=5,
        feature_projection_input_dim=20, unit_hifi_gan_vocab_size=40,
        vocoder_num_langs=3, vocoder_num_spkrs=2, t2u_max_position_embeddings=64,
        upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        unit_embed_dim=32, lang_embed_dim=8, spkr_embed_dim=8,
        upsample_initial_channel=32, max_position_embeddings=128)


def test_seamless_m4t_text_to_text_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.seamless_m4t import SeamlessM4TForTextToText

    torch.manual_seed(0)
    tm = transformers.SeamlessM4TForTextToText(_tiny_cfg(transformers)).eval()
    d = str(tmp_path / "m4t_t2t")
    tm.save_pretrained(d, safe_serialization=True)
    m = SeamlessM4TForTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    dec = np.array([[3, 5, 8, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5

    with torch.no_grad():
        tg = tm.generate(torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
                         num_beams=1).numpy()
    og = np.asarray(m.generate(m.params, input_ids=jnp.asarray(ids), max_new_tokens=8))
    n = min(tg.shape[1], og.shape[1])
    np.testing.assert_array_equal(og[0, :n], tg[0, :n])


def test_seamless_m4t_speech_to_text_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.seamless_m4t import SeamlessM4TForSpeechToText

    torch.manual_seed(1)
    tm = transformers.SeamlessM4TForSpeechToText(_tiny_cfg(transformers)).eval()
    d = str(tmp_path / "m4t_s2t")
    tm.save_pretrained(d, safe_serialization=True)
    m = SeamlessM4TForSpeechToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    feats = np.random.default_rng(1).normal(size=(1, 16, 20)).astype(np.float32)
    dec = np.array([[3, 5, 8, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_features=torch.from_numpy(feats),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_features=jnp.asarray(feats),
            decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 1e-4


def test_seamless_m4t_vocoder_parity(tmp_path):
    import torch
    import transformers
    from transformers.models.seamless_m4t.modeling_seamless_m4t import (
        SeamlessM4TCodeHifiGan as TorchVocoder,
    )

    from transformers_tpu.models.seamless_m4t import SeamlessM4TCodeHifiGan

    torch.manual_seed(2)
    cfg = _tiny_cfg(transformers)
    tv = TorchVocoder(cfg).eval()
    d = str(tmp_path / "m4t_voc")
    tv.save_pretrained(d, safe_serialization=True)
    m = SeamlessM4TCodeHifiGan.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    units = np.array([[5, 9, 12, 3, 7]], dtype=np.int64)
    spkr = np.array([1], dtype=np.int64)
    lang = np.array([2], dtype=np.int64)
    with torch.no_grad():
        ref_wav, ref_len = tv(input_ids=torch.from_numpy(units),
                              spkr_id=torch.from_numpy(spkr[:, None]),
                              lang_id=torch.from_numpy(lang[:, None]))
    wav, lengths = m(m.params, jnp.asarray(units), jnp.asarray(spkr[:, None]),
                     jnp.asarray(lang[:, None]))
    assert np.asarray(wav).shape == ref_wav.numpy().shape
    assert max_abs_diff(wav, ref_wav.numpy()) < 1e-4


def _tiny_v2_cfg(transformers):
    return transformers.SeamlessM4Tv2Config(
        vocab_size=64, t2u_vocab_size=40, hidden_size=32,
        speech_encoder_layers=2, speech_encoder_attention_heads=4,
        speech_encoder_intermediate_size=48, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4, encoder_ffn_dim=48,
        decoder_ffn_dim=48, t2u_encoder_layers=1, t2u_decoder_layers=1,
        t2u_encoder_ffn_dim=48, t2u_decoder_ffn_dim=48,
        t2u_encoder_attention_heads=4, t2u_decoder_attention_heads=4,
        adaptor_kernel_size=3, adaptor_stride=2, num_adapter_layers=1,
        conv_depthwise_kernel_size=5, feature_projection_input_dim=20,
        unit_hifi_gan_vocab_size=40, vocoder_num_langs=3, vocoder_num_spkrs=2,
        t2u_max_position_embeddings=64, upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4], resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], unit_embed_dim=32, lang_embed_dim=8,
        spkr_embed_dim=8, upsample_initial_channel=32, max_position_embeddings=128,
        left_max_position_embeddings=8, right_max_position_embeddings=4,
        speech_encoder_chunk_size=4, speech_encoder_left_chunk_num=1,
        t2u_variance_predictor_embed_dim=32, t2u_variance_predictor_hidden_dim=32,
        char_vocab_size=20)


def test_seamless_m4t_v2_text_to_text_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.seamless_m4t_v2 import SeamlessM4Tv2ForTextToText

    torch.manual_seed(3)
    tm = transformers.SeamlessM4Tv2ForTextToText(_tiny_v2_cfg(transformers)).eval()
    d = str(tmp_path / "m4t2_t2t")
    tm.save_pretrained(d, safe_serialization=True)
    m = SeamlessM4Tv2ForTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    dec = np.array([[3, 5, 8, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_seamless_m4t_v2_speech_to_text_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.seamless_m4t_v2 import SeamlessM4Tv2ForSpeechToText

    torch.manual_seed(4)
    tm = transformers.SeamlessM4Tv2ForSpeechToText(_tiny_v2_cfg(transformers)).eval()
    d = str(tmp_path / "m4t2_s2t")
    tm.save_pretrained(d, safe_serialization=True)
    m = SeamlessM4Tv2ForSpeechToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    feats = np.random.default_rng(4).normal(size=(1, 16, 20)).astype(np.float32)
    dec = np.array([[3, 5, 8, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_features=torch.from_numpy(feats),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_features=jnp.asarray(feats),
            decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 1e-4
