"""CPM-Ant parity vs torch transformers (prompt-prepended decoder)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
hf = pytest.importorskip("transformers")

import jax.numpy as jnp

import transformers_tpu as ttpu


def _tiny_config():
    return dict(vocab_size=99, hidden_size=32, num_attention_heads=4, dim_head=8,
                dim_ff=64, num_hidden_layers=2, prompt_types=4, prompt_length=4,
                segment_types=4, position_bias_num_buckets=8,
                position_bias_max_distance=32)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    torch.manual_seed(0)
    cfg = hf.CpmAntConfig(**_tiny_config())
    tm = hf.CpmAntForCausalLM(cfg).eval()
    # the default init leaves the bias table at zero-ish; randomize so the
    # segment-vs-absolute bucket selection actually matters
    with torch.no_grad():
        tm.cpmant.position_bias.relative_attention_bias.normal_(std=0.5)
    path = tmp_path_factory.mktemp("cpmant") / "ckpt"
    tm.save_pretrained(path, safe_serialization=True)
    return str(path), tm


def test_cpmant_logits_parity(ckpt):
    path, tm = ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(path, dtype="float32")
    # include 0s (padding -> segment 0) to exercise the length/segment logic
    ids = [[0, 0, 5, 17, 42, 9, 88], [3, 1, 4, 1, 5, 9, 2]]
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), use_cache=False).logits.numpy()
    got = np.asarray(model(model.params, input_ids=jnp.asarray(ids)).logits)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_cpmant_greedy_and_roundtrip(ckpt, tmp_path):
    path, tm = ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(path, dtype="float32")
    ids = [[5, 17, 42, 9, 88]]
    with torch.no_grad():
        ref = tm.generate(torch.tensor(ids), max_new_tokens=6, do_sample=False,
                          use_cache=False)[0].tolist()
    got = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=6))[0].tolist()
    assert got[: len(ref)] == ref
    # save_pretrained keeps the raw (no .weight) bias-table key so torch reloads
    model.save_pretrained(tmp_path / "resaved")
    tm2 = hf.CpmAntForCausalLM.from_pretrained(tmp_path / "resaved").eval()
    with torch.no_grad():
        a = tm(input_ids=torch.tensor(ids), use_cache=False).logits
        b = tm2(input_ids=torch.tensor(ids), use_cache=False).logits
    assert (a - b).abs().max().item() == 0.0


def test_cpmant_standalone_hidden(ckpt):
    path, tm = ckpt
    model = ttpu.AutoModel.from_pretrained(path, dtype="float32")
    ids = [[7, 11, 13, 17, 19]]
    with torch.no_grad():
        ref = tm.cpmant(input_ids=torch.tensor(ids),
                        use_cache=False).last_hidden_state.numpy()
    got = np.asarray(model(model.params,
                           input_ids=jnp.asarray(ids)).last_hidden_state)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
