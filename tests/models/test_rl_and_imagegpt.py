"""Parity vs torch: ImageGPT (RMS-style LayerNorm GPT-2) and Decision
Transformer (interleaved trajectory GPT-2)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def test_imagegpt_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.imagegpt import ImageGPTForCausalImageModeling

    torch.manual_seed(0)
    cfg = transformers.ImageGPTConfig(vocab_size=99, n_positions=64, n_embd=32,
                                      n_layer=2, n_head=4)
    tm = transformers.ImageGPTForCausalImageModeling(cfg).eval()
    d = str(tmp_path / "imagegpt")
    tm.save_pretrained(d, safe_serialization=True)
    m = ImageGPTForCausalImageModeling.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    # ImageGPT's un-centered LayerNorm divides by the raw RMS, which at
    # random init amplifies f32 accumulation-order differences layer over
    # layer (layer0 3e-5 -> logits ~2e-4); structure verified exact.
    assert max_abs_diff(out.logits, ref) < 1e-3


def test_decision_transformer_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.decision_transformer import DecisionTransformerModel

    torch.manual_seed(1)
    cfg = transformers.DecisionTransformerConfig(state_dim=5, act_dim=3,
                                                 hidden_size=32, n_layer=2,
                                                 n_head=4, max_ep_len=16)
    tm = transformers.DecisionTransformerModel(cfg).eval()
    d = str(tmp_path / "dt")
    tm.save_pretrained(d, safe_serialization=True)
    m = DecisionTransformerModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    rng = np.random.default_rng(1)
    states = rng.normal(size=(2, 6, 5)).astype(np.float32)
    actions = rng.normal(size=(2, 6, 3)).astype(np.float32)
    returns = rng.normal(size=(2, 6, 1)).astype(np.float32)
    timesteps = np.tile(np.arange(6), (2, 1)).astype(np.int64)
    with torch.no_grad():
        ref = tm(states=torch.from_numpy(states), actions=torch.from_numpy(actions),
                 returns_to_go=torch.from_numpy(returns),
                 timesteps=torch.from_numpy(timesteps))
    out = m(m.params, states=jnp.asarray(states), actions=jnp.asarray(actions),
            returns_to_go=jnp.asarray(returns), timesteps=jnp.asarray(timesteps))
    assert max_abs_diff(out.action_preds, ref.action_preds.numpy()) < 5e-5
    assert max_abs_diff(out.state_preds, ref.state_preds.numpy()) < 5e-5
    assert max_abs_diff(out.return_preds, ref.return_preds.numpy()) < 5e-5
