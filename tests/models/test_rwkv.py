"""RWKV v4 parity vs torch: WKV linear-attention scan + channel mix +
inference weight rescaling; forward logits + greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 11, 17, 6, 9]],
               dtype=np.int64)


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.RwkvConfig(
        vocab_size=99, context_length=64, hidden_size=32, num_hidden_layers=4,
        attention_hidden_size=32, intermediate_size=64, rescale_every=2)
    tm = transformers.RwkvForCausalLM(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "rwkv")
    tm = make_tiny(d)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    # compare per row: torch's batched generate perturbs still-running rows
    # once another row finishes early (its own batched output disagrees with
    # its single-row output), so single-row runs are the trustworthy oracle
    import torch

    d = str(tmp_path / "rwkv-gen")
    tm = make_tiny(d)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    max_new_tokens=8,
                                    prompt_pad_multiple=IDS.shape[1]))
    for row in range(IDS.shape[0]):
        with torch.no_grad():
            ref = tm.generate(input_ids=torch.tensor(IDS[row:row + 1]),
                              max_new_tokens=8, do_sample=False).numpy()[0]
        ours = out[row, :len(ref)]
        eos = np.where(ref[IDS.shape[1]:] == 0)[0]
        n = IDS.shape[1] + (int(eos[0]) + 1 if len(eos) else 8)
        np.testing.assert_array_equal(ours[:n], ref[:n])
