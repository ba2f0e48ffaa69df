"""Bark parity vs torch: causal stages, fine in-fill, full TTS cascade."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

SEM_VOCAB = 40
CODEBOOK = 8


def _sub_cfg(**kw):
    base = dict(block_size=256, input_vocab_size=200, output_vocab_size=200,
                num_layers=2, num_heads=4, hidden_size=32, bias=True)
    base.update(kw)
    return base


def _bark_cfg(transformers):
    # coarse vocab must cover semantic_vocab + 2*codebook + infer token
    return transformers.BarkConfig(
        semantic_config=_sub_cfg(),
        coarse_acoustics_config=_sub_cfg(input_vocab_size=80, output_vocab_size=80),
        fine_acoustics_config=_sub_cfg(input_vocab_size=CODEBOOK + 1,
                                       output_vocab_size=CODEBOOK + 1,
                                       n_codes_total=4, n_codes_given=1),
        codec_config=dict(audio_channels=1, num_filters=4, hidden_size=16,
                          num_residual_layers=1, upsampling_ratios=[4, 2],
                          codebook_size=CODEBOOK, codebook_dim=16,
                          target_bandwidths=[6.0], sampling_rate=160,
                          normalize=False, chunk_length_s=None,
                          overlap=None))


def _gen_configs():
    from transformers.models.bark.generation_configuration_bark import (
        BarkCoarseGenerationConfig,
        BarkFineGenerationConfig,
        BarkSemanticGenerationConfig,
    )
    sgen = BarkSemanticGenerationConfig(
        eos_token_id=SEM_VOCAB, semantic_vocab_size=SEM_VOCAB,
        semantic_pad_token=SEM_VOCAB, text_encoding_offset=50,
        text_pad_token=190, semantic_infer_token=199,
        max_input_semantic_length=16, semantic_rate_hz=4.0,
        max_new_tokens=12, do_sample=False)
    cgen = BarkCoarseGenerationConfig(
        coarse_semantic_pad_token=SEM_VOCAB, coarse_rate_hz=4.0,
        n_coarse_codebooks=2, coarse_infer_token=SEM_VOCAB + 2 * CODEBOOK + 1,
        max_coarse_input_length=16, max_coarse_history=8,
        sliding_window_len=4, do_sample=False)
    fgen = BarkFineGenerationConfig(max_fine_history_length=8,
                                    max_fine_input_length=16,
                                    n_fine_codebooks=4, temperature=None)
    return sgen, cgen, fgen


def _ours_gen_configs():
    from transformers_tpu.models.bark import (
        BarkCoarseGenerationConfig,
        BarkFineGenerationConfig,
        BarkSemanticGenerationConfig,
    )
    sgen = BarkSemanticGenerationConfig(
        eos_token_id=SEM_VOCAB, semantic_vocab_size=SEM_VOCAB,
        text_encoding_offset=50, text_pad_token=190,
        semantic_infer_token=199, max_input_semantic_length=16,
        semantic_rate_hz=4.0, max_new_tokens=12)
    cgen = BarkCoarseGenerationConfig(
        coarse_semantic_pad_token=SEM_VOCAB, coarse_rate_hz=4.0,
        n_coarse_codebooks=2, coarse_infer_token=SEM_VOCAB + 2 * CODEBOOK + 1,
        max_coarse_input_length=16, max_coarse_history=8, sliding_window_len=4)
    fgen = BarkFineGenerationConfig(max_fine_history_length=8,
                                    max_fine_input_length=16,
                                    n_fine_codebooks=4, temperature=None)
    return sgen, cgen, fgen


def test_bark_causal_and_fine_forward_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = _bark_cfg(transformers)
    tm = transformers.BarkModel(cfg).eval()
    d = str(tmp_path / "bark")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.bark import BarkModel
    m = BarkModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.random.default_rng(0).integers(1, 200, size=(1, 10))
    with torch.no_grad():
        ref = tm.semantic(input_ids=torch.tensor(ids)).logits.numpy()
    out = m.semantic(m.params["semantic"], input_ids=ids).logits
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)

    fine_ids = np.random.default_rng(1).integers(
        0, CODEBOOK, size=(1, 12, 4))
    with torch.no_grad():
        fref = tm.fine_acoustics(2, input_ids=torch.tensor(fine_ids)).logits.numpy()
    fout = m.fine_acoustics(m.params["fine_acoustics"], codebook_idx=2,
                            input_ids=fine_ids).logits
    assert max_abs_diff(fout, fref) < 3e-5, max_abs_diff(fout, fref)


def test_bark_full_generate_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(2)
    cfg = _bark_cfg(transformers)
    tm = transformers.BarkModel(cfg).eval()
    d = str(tmp_path / "bark_gen")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.bark import BarkModel
    m = BarkModel.from_pretrained(d, dtype="float32")

    sgen_t, cgen_t, fgen_t = _gen_configs()
    # the processor pads text ids to max_input_semantic_length
    ids = np.random.default_rng(3).integers(1, 40, size=(1, 6))
    mask = np.zeros((1, 16), np.int64)
    mask[:, :6] = 1
    ids = np.pad(ids, ((0, 0), (0, 10)))
    with torch.no_grad():
        sem_t = tm.semantic.generate(torch.tensor(ids),
                                     attention_mask=torch.tensor(mask),
                                     semantic_generation_config=sgen_t)
        coarse_t = tm.coarse_acoustics.generate(
            sem_t.clone(), semantic_generation_config=sgen_t,
            coarse_generation_config=cgen_t, codebook_size=CODEBOOK)
        fine_t = tm.fine_acoustics.generate(
            coarse_t, semantic_generation_config=sgen_t,
            coarse_generation_config=cgen_t, fine_generation_config=fgen_t,
            codebook_size=CODEBOOK)
        audio_t = tm.codec_decode(fine_t)

    sgen, cgen, fgen = _ours_gen_configs()
    sem = m.semantic.generate(m.params["semantic"], ids, attention_mask=mask,
                              semantic_generation_config=sgen)
    assert np.array_equal(np.asarray(sem)[0, :sem_t.shape[1]],
                          sem_t[0].numpy()), (np.asarray(sem), sem_t)
    coarse = m.coarse_acoustics.generate(
        m.params["coarse_acoustics"], np.asarray(sem_t),
        semantic_generation_config=sgen, coarse_generation_config=cgen,
        codebook_size=CODEBOOK)
    assert np.array_equal(np.asarray(coarse), coarse_t.numpy())
    fine = m.fine_acoustics.generate(
        m.params["fine_acoustics"], coarse,
        semantic_generation_config=sgen, coarse_generation_config=cgen,
        fine_generation_config=fgen, codebook_size=CODEBOOK)
    assert np.array_equal(np.asarray(fine), fine_t.numpy())
    audio = m.codec_decode(m.params, fine)
    assert max_abs_diff(audio, audio_t.numpy()) < 1e-4, \
        max_abs_diff(audio, audio_t.numpy())
