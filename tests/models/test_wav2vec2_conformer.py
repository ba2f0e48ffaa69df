"""Wav2Vec2-Conformer parity vs torch (relative / rotary / no positions)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


@pytest.mark.parametrize("pos", ["relative", "rotary", None])
def test_wav2vec2_conformer_parity(tmp_path, pos):
    import torch
    import transformers

    from transformers_tpu.models.wav2vec2_conformer import Wav2Vec2ConformerForCTC

    torch.manual_seed(0)
    cfg = transformers.Wav2Vec2ConformerConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[3, 3],
        conv_stride=[2, 2], num_feat_extract_layers=2, num_conv_pos_embeddings=9,
        num_conv_pos_embedding_groups=2, conv_depthwise_kernel_size=5,
        position_embeddings_type=pos, do_stable_layer_norm=False,
        apply_spec_augment=False)
    tm = transformers.Wav2Vec2ConformerForCTC(cfg).eval()
    d = str(tmp_path / f"w2v2c_{pos}")
    tm.save_pretrained(d, safe_serialization=True)
    m = Wav2Vec2ConformerForCTC.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = np.random.default_rng(0).normal(size=(2, 400)).astype(np.float32)
    mask = np.ones((2, 400), np.int64)
    with torch.no_grad():
        ref = tm(input_values=torch.from_numpy(x),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(x), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 1e-4


@pytest.mark.parametrize("pos,adapter", [("relative_key", False), ("relative", True),
                                         ("rotary", False), (None, False)])
def test_wav2vec2_bert_parity(tmp_path, pos, adapter):
    import torch
    import transformers

    from transformers_tpu.models.wav2vec2_bert import Wav2Vec2BertForCTC

    torch.manual_seed(1)
    cfg = transformers.Wav2Vec2BertConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=20,
        conv_depthwise_kernel_size=5, position_embeddings_type=pos,
        left_max_position_embeddings=8, right_max_position_embeddings=4,
        add_adapter=adapter, num_adapter_layers=1, apply_spec_augment=False,
        mask_time_prob=0.0, mask_feature_prob=0.0,
        use_intermediate_ffn_before_adapter=adapter)
    tm = transformers.Wav2Vec2BertForCTC(cfg).eval()
    d = str(tmp_path / f"w2vb_{pos}_{adapter}")
    tm.save_pretrained(d, safe_serialization=True)
    m = Wav2Vec2BertForCTC.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = np.random.default_rng(1).normal(size=(2, 24, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_features=torch.from_numpy(x)).logits.numpy()
    out = m(m.params, input_features=jnp.asarray(x))
    assert max_abs_diff(out.logits, ref) < 1e-4


def test_sew_d_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.sew_d import SEWDForCTC

    torch.manual_seed(2)
    cfg = transformers.SEWDConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, squeeze_factor=2, position_buckets=8,
        max_position_embeddings=64, conv_dim=[16, 16], conv_kernel=[3, 3],
        conv_stride=[2, 2], num_conv_pos_embeddings=9,
        num_conv_pos_embedding_groups=2, apply_spec_augment=False)
    tm = transformers.SEWDForCTC(cfg).eval()
    d = str(tmp_path / "sewd")
    tm.save_pretrained(d, safe_serialization=True)
    m = SEWDForCTC.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    x = np.random.default_rng(2).normal(size=(2, 400)).astype(np.float32)
    mask = np.ones((2, 400), np.int64)
    with torch.no_grad():
        ref = tm(input_values=torch.from_numpy(x),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(x), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 1e-4
