"""HuBERT / WavLM parity vs torch (CTC logits + audio classification)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vocab_size=32, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, conv_dim=(16, 32), conv_stride=(4, 2), conv_kernel=(8, 4),
    num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2,
    hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
)

AUDIO = np.random.default_rng(0).normal(size=(2, 400)).astype(np.float32)
MASK = np.concatenate([np.ones((2, 300), np.int64), np.zeros((2, 100), np.int64)], axis=1)
MASK[0, :] = 1

CASES = {
    "hubert": ("HubertForCTC", "HubertConfig", dict()),
    "hubert-stable": ("HubertForCTC", "HubertConfig",
                      dict(feat_extract_norm="layer", do_stable_layer_norm=True)),
    "hubert-noln": ("HubertForCTC", "HubertConfig", dict(feat_proj_layer_norm=False)),
    "wavlm": ("WavLMForCTC", "WavLMConfig", dict(num_buckets=32, max_bucket_distance=50)),
    "wavlm-stable": ("WavLMForCTC", "WavLMConfig",
                     dict(num_buckets=32, max_bucket_distance=50,
                          feat_extract_norm="layer", do_stable_layer_norm=True)),
    "unispeech": ("UniSpeechForCTC", "UniSpeechConfig", dict()),
    "unispeech_sat": ("UniSpeechSatForCTC", "UniSpeechSatConfig", dict()),
    "data2vec_audio": ("Data2VecAudioForCTC", "Data2VecAudioConfig",
                       dict(feat_extract_norm="layer", conv_bias=False,
                            num_conv_pos_embeddings=3, conv_pos_kernel_size=5,
                            num_conv_pos_embedding_groups=4)),
    "sew": ("SEWForCTC", "SEWConfig",
            dict(conv_dim=(16, 32), conv_stride=(4, 2), conv_kernel=(8, 4),
                 squeeze_factor=2)),
}


def make_torch(tmp_dir, cls_name, config_name, over):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = getattr(transformers, config_name)(**{**TINY, **over}, attn_implementation="eager")
    tm = getattr(transformers, cls_name)(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("family", sorted(CASES))
def test_ctc_logit_parity(family, tmp_path):
    import torch

    cls_name, config_name, over = CASES[family]
    d = str(tmp_path / family)
    tm = make_torch(d, cls_name, config_name, over)
    m = ttpu.AutoModelForCTC.from_pretrained(d, dtype="float32")
    missing = [k for k in m.load_report.missing_keys if "masked_spec_embed" not in k]
    assert not missing, missing
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(AUDIO),
                 attention_mask=torch.tensor(MASK)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(AUDIO), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 5e-5, family


@pytest.mark.parametrize("family,config_name,cls", [
    ("hubert", "HubertConfig", "HubertForSequenceClassification"),
    ("wavlm", "WavLMConfig", "WavLMForSequenceClassification"),
])
def test_audio_classification_parity(family, config_name, cls, tmp_path):
    import torch

    d = str(tmp_path / family)
    over = dict(num_labels=4, use_weighted_layer_sum=True)
    if family == "wavlm":
        over.update(num_buckets=32, max_bucket_distance=50)
    tm = make_torch(d, cls, config_name, over)
    m = ttpu.AutoModelForAudioClassification.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(AUDIO),
                 attention_mask=torch.tensor(MASK)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(AUDIO), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 5e-5, family
