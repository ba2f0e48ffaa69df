"""New logits processors + watermarking."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.generation.logits_process import (  # noqa: E402
    EpsilonLogitsWarper,
    EtaLogitsWarper,
    LogitNormalization,
    NoBadWordsLogitsProcessor,
    TypicalLogitsWarper,
)
from transformers_tpu.generation.watermarking import (  # noqa: E402
    WatermarkDetector,
    WatermarkLogitsProcessor,
)


def _logits(seed=0, b=2, v=50):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(b, v)), jnp.float32)


def test_typical_warper_matches_reference():
    import torch
    from transformers.generation.logits_process import TypicalLogitsWarper as HF

    logits = _logits()
    ours = TypicalLogitsWarper(mass=0.8)(logits)
    theirs = HF(mass=0.8)(None, torch.tensor(np.asarray(logits))).numpy()
    ours_np = np.asarray(ours)
    np.testing.assert_array_equal(np.isneginf(ours_np), np.isneginf(theirs))
    np.testing.assert_allclose(np.where(np.isneginf(ours_np), 0, ours_np),
                               np.where(np.isneginf(theirs), 0, theirs), atol=1e-6)


def test_epsilon_eta_warpers_match_reference():
    import torch
    from transformers.generation.logits_process import (
        EpsilonLogitsWarper as HFEps,
        EtaLogitsWarper as HFEta,
    )

    logits = _logits(1)
    ours = EpsilonLogitsWarper(0.02)(logits)
    theirs = HFEps(0.02)(None, torch.tensor(np.asarray(logits))).numpy()
    np.testing.assert_array_equal(np.isneginf(np.asarray(ours)), np.isneginf(theirs))

    oe = EtaLogitsWarper(0.02)(logits)
    te = HFEta(0.02)(None, torch.tensor(np.asarray(logits))).numpy()
    np.testing.assert_array_equal(np.isneginf(np.asarray(oe)), np.isneginf(te))


def test_bad_words_single_and_multi():
    proc = NoBadWordsLogitsProcessor([[7], [3, 9]])
    logits = _logits(2)
    ids = jnp.asarray([[1, 3, 0, 0], [1, 2, 0, 0]], jnp.int32)
    state = {"ids": ids, "pos": jnp.asarray(2, jnp.int32), "gen_count": jnp.asarray(1)}
    out = np.asarray(proc(logits, state))
    assert np.isneginf(out[:, 7]).all()          # single banned everywhere
    assert np.isneginf(out[0, 9])                 # row 0 prefix [.., 3] matches
    assert not np.isneginf(out[1, 9])             # row 1 prefix [.., 2] doesn't


def test_logit_normalization():
    out = np.asarray(LogitNormalization()(_logits(3)))
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-5)


def test_watermark_bias_and_detection():
    vocab = 64
    proc = WatermarkLogitsProcessor(vocab, greenlist_ratio=0.25, bias=5.0)
    rng = np.random.default_rng(0)
    # generate a "watermarked" sequence by greedily following the green bias
    seq = [5]
    for _ in range(60):
        logits = jnp.asarray(rng.normal(size=(1, vocab)), jnp.float32)
        state = {"ids": jnp.asarray([seq + [0] * 10], jnp.int32),
                 "pos": jnp.asarray(len(seq), jnp.int32)}
        biased = proc(logits, state)
        seq.append(int(np.argmax(np.asarray(biased)[0])))
    detector = WatermarkDetector(proc)
    marked = detector.score(np.asarray(seq))
    unmarked = detector.score(rng.integers(0, vocab, size=len(seq)))
    assert marked["z_score"][0] > 4.0
    assert unmarked["z_score"][0] < 4.0
    assert marked["prediction"][0] and not unmarked["prediction"][0]


# --------------------------------------------------------------------------
# round-2 additions, each vs the torch reference implementation
# --------------------------------------------------------------------------

def _state(ids, prompt_len=None):
    ids = np.asarray(ids)
    t = ids.shape[1]
    return {
        "ids": jnp.asarray(ids),
        "mask": jnp.ones_like(jnp.asarray(ids)),
        "pos": jnp.int32(t),
        "gen_count": jnp.int32(t - (prompt_len or 0)),
    }


def test_min_length_matches_reference():
    import torch
    from transformers.generation.logits_process import MinLengthLogitsProcessor as TorchMin

    from transformers_tpu.generation.logits_process import MinLengthLogitsProcessor

    ids = np.array([[3, 5, 7]])
    logits = _logits(1, 1, 20)
    ref = TorchMin(5, eos_token_id=torch.tensor([2]))(
        torch.tensor(ids), torch.tensor(np.asarray(logits))).numpy()
    ours = MinLengthLogitsProcessor(5, [2], prompt_len=0)(logits, _state(ids))
    # both ban eos; masked value differs (-inf vs NEG_INF) — compare masks
    assert ref[0, 2] == -np.inf and np.asarray(ours)[0, 2] <= -1e8
    np.testing.assert_allclose(np.delete(np.asarray(ours)[0], 2),
                               np.delete(ref[0], 2), atol=1e-6)


def test_encoder_repetition_penalty_matches_reference():
    import torch
    from transformers.generation.logits_process import (
        EncoderRepetitionPenaltyLogitsProcessor as TorchEnc,
    )

    from transformers_tpu.generation.logits_process import (
        EncoderRepetitionPenaltyLogitsProcessor,
    )

    enc_ids = np.array([[4, 9, 4, 11]])
    ids = np.array([[1, 2]])
    logits = _logits(2, 1, 20)
    ref = TorchEnc(1.7, torch.tensor(enc_ids))(
        torch.tensor(ids), torch.tensor(np.asarray(logits))).numpy()
    ours = EncoderRepetitionPenaltyLogitsProcessor(1.7, enc_ids)(logits, _state(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_encoder_no_repeat_ngram_matches_reference():
    import torch
    from transformers.generation.logits_process import (
        EncoderNoRepeatNGramLogitsProcessor as TorchEnc,
    )

    from transformers_tpu.generation.logits_process import (
        EncoderNoRepeatNGramLogitsProcessor,
    )

    enc_ids = np.array([[4, 9, 11, 4, 9, 13]])
    ids = np.array([[7, 4, 9]])  # last two = [4, 9] -> ban 11 and 13
    logits = _logits(3, 1, 20)
    ref = TorchEnc(3, torch.tensor(enc_ids))(
        torch.tensor(ids), torch.tensor(np.asarray(logits))).numpy()
    ours = np.asarray(EncoderNoRepeatNGramLogitsProcessor(3, enc_ids)(logits, _state(ids)))
    banned_ref = ref[0] == -np.inf
    banned_ours = ours[0] <= -1e8
    np.testing.assert_array_equal(banned_ours, banned_ref)
    np.testing.assert_allclose(ours[0][~banned_ours], ref[0][~banned_ref], atol=1e-6)


def test_sequence_bias_matches_reference():
    import torch
    from transformers.generation.logits_process import (
        SequenceBiasLogitsProcessor as TorchBias,
    )

    from transformers_tpu.generation.logits_process import SequenceBiasLogitsProcessor

    bias = {(5,): 2.5, (4, 9): -3.0, (1, 2): 7.0}
    ids = np.array([[7, 3, 4]])  # tail [4] matches (4, 9) prefix -> bias on 9
    logits = _logits(4, 1, 20)
    ref = TorchBias(sequence_bias=bias)(
        torch.tensor(ids), torch.tensor(np.asarray(logits))).numpy()
    ours = SequenceBiasLogitsProcessor(bias)(logits, _state(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_classifier_free_guidance_matches_reference():
    import torch
    from transformers.generation.logits_process import (
        ClassifierFreeGuidanceLogitsProcessor as TorchCFG,
    )

    from transformers_tpu.generation.logits_process import (
        ClassifierFreeGuidanceLogitsProcessor,
    )

    logits = _logits(5, 4, 20)  # doubled batch of 2
    ids = np.array([[1], [2]])
    ref = TorchCFG(1.5)(torch.tensor(ids), torch.tensor(np.asarray(logits))).numpy()
    ours = ClassifierFreeGuidanceLogitsProcessor(1.5)(logits, None)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_inf_nan_remove():
    from transformers_tpu.generation.logits_process import InfNanRemoveLogitsProcessor

    logits = jnp.asarray([[1.0, np.nan, np.inf, -np.inf]])
    out = np.asarray(InfNanRemoveLogitsProcessor()(logits, None))
    assert np.isfinite(out).all() and out[0, 0] == 1.0 and out[0, 1] == 0.0


def test_hamming_diversity():
    from transformers_tpu.generation.logits_process import HammingDiversityLogitsProcessor

    logits = _logits(6, 2, 10)
    proc = HammingDiversityLogitsProcessor(0.7, num_beams=4, num_beam_groups=2)
    state = dict(_state(np.array([[1], [2]])))
    state["current_tokens"] = jnp.asarray([3, 3, 5])
    out = np.asarray(proc(logits, state))
    np.testing.assert_allclose(out[:, 3], np.asarray(logits)[:, 3] - 1.4, atol=1e-6)
    np.testing.assert_allclose(out[:, 5], np.asarray(logits)[:, 5] - 0.7, atol=1e-6)
    np.testing.assert_allclose(out[:, 0], np.asarray(logits)[:, 0], atol=1e-6)


def test_prefix_constrained():
    from transformers_tpu.generation.logits_process import PrefixConstrainedLogitsProcessor

    def allowed_fn(batch_id, ids):
        return [2, 3] if batch_id == 0 else [7]

    logits = _logits(7, 2, 10)
    out = np.asarray(PrefixConstrainedLogitsProcessor(allowed_fn)(
        logits, _state(np.array([[1, 4], [2, 5]]))))
    assert (out[0, [2, 3]] > -1e8).all() and (out[1, 7] > -1e8)
    assert out[0, 5] <= -1e8 and out[1, 2] <= -1e8


def test_alternating_codebooks_and_bark_eos():
    import torch
    from transformers.generation.logits_process import (
        AlternatingCodebooksLogitsProcessor as TorchAlt,
        BarkEosPrioritizerLogitsProcessor as TorchEos,
    )

    from transformers_tpu.generation.logits_process import (
        AlternatingCodebooksLogitsProcessor,
        BarkEosPrioritizerLogitsProcessor,
    )

    logits = _logits(8, 1, 30)
    ids = np.array([[1, 2, 3, 4]])  # total len 4 -> even -> first codebook
    ref = TorchAlt(4, semantic_vocab_size=10, codebook_size=8)(
        torch.tensor(ids), torch.tensor(np.asarray(logits))).numpy()
    ours = np.asarray(AlternatingCodebooksLogitsProcessor(4, 10, 8)(
        logits, {"gen_count": jnp.int32(0)}))
    np.testing.assert_array_equal(ours <= -1e8, ref == -np.inf)

    # Bark eos prioritizer: forced when p(eos) > threshold
    lg = jnp.asarray([[0.0, 10.0, 0.0]])
    ref2 = TorchEos(eos_token_id=torch.tensor([1]), min_eos_p=0.5, device="cpu")(
        torch.tensor(ids), torch.tensor(np.asarray(lg))).numpy()
    ours2 = np.asarray(BarkEosPrioritizerLogitsProcessor([1], 0.5)(lg, None))
    np.testing.assert_array_equal(ours2 <= -1e8, ref2 == -np.inf)


def test_whisper_timestamp_grammar():
    from transformers_tpu.generation.logits_process import WhisperTimeStampLogitsProcessor

    class GenCfg:
        no_timestamps_token_id = 10
        eos_token_id = 9
        max_initial_timestamp_index = None

    proc = WhisperTimeStampLogitsProcessor(GenCfg())
    v = 16  # tokens 11..15 are timestamps
    logits = _logits(9, 1, v)
    # last token was a lone timestamp (12): text must be banned
    st = _state(np.array([[5, 12]]), prompt_len=0)
    out = np.asarray(proc(logits, st))
    assert (out[0, :9] <= -1e8).all()          # text banned
    assert (out[0, 11:] > -1e8).any()          # timestamps open
    # completed pair [12, 13]: timestamps banned
    st2 = _state(np.array([[12, 13]]), prompt_len=0)
    out2 = np.asarray(proc(logits, st2))
    assert (out2[0, 11:] <= -1e8).all()
