"""LoRA: PEFT-checkpoint parity, merge equivalence, trainability mask."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama, max_abs_diff, torch_logits  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)


@pytest.fixture(scope="module")
def lora_ckpt(tmp_path_factory):
    """Base model + a PEFT LoRA adapter with non-trivial weights."""
    import torch
    from peft import LoraConfig as PeftLoraConfig, get_peft_model

    base_dir = str(tmp_path_factory.mktemp("base"))
    torch_model, _ = make_tiny_torch_llama(base_dir, num_hidden_layers=2)
    peft_cfg = PeftLoraConfig(r=4, lora_alpha=8, target_modules=["q_proj", "v_proj"],
                              lora_dropout=0.0)
    peft_model = get_peft_model(torch_model, peft_cfg)
    # give lora_B nonzero values so the adapter actually changes outputs
    torch.manual_seed(7)
    for name, p in peft_model.named_parameters():
        if "lora_B" in name:
            with torch.no_grad():
                p.copy_(torch.randn_like(p) * 0.1)
    adapter_dir = str(tmp_path_factory.mktemp("adapter"))
    peft_model.save_pretrained(adapter_dir)
    peft_model.eval()
    return base_dir, adapter_dir, peft_model


def test_adapter_parity_vs_peft(lora_ckpt):
    import torch

    base_dir, adapter_dir, peft_model = lora_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(base_dir, dtype="float32")
    params = ttpu.load_adapter(model, model.params, adapter_dir)
    with torch.no_grad():
        ref = peft_model(input_ids=torch.tensor(IDS)).logits.float().numpy()
    out = model(params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_merge_matches_adapter_forward(lora_ckpt):
    base_dir, adapter_dir, _ = lora_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(base_dir, dtype="float32")
    params = ttpu.load_adapter(model, model.params, adapter_dir)
    with_adapter = model(params, input_ids=jnp.asarray(IDS)).logits
    import copy

    merged = ttpu.merge_lora(params)
    assert "lora_A" not in merged["model"]["layers"]["0"]["self_attn"]["q_proj"]
    after_merge = model(merged, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(with_adapter, after_merge) < 1e-4


def test_save_adapter_roundtrip(lora_ckpt, tmp_path):
    base_dir, adapter_dir, _ = lora_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(base_dir, dtype="float32")
    params = ttpu.load_adapter(model, model.params, adapter_dir)
    ref = model(params, input_ids=jnp.asarray(IDS)).logits

    out_dir = str(tmp_path / "resaved")
    ttpu.save_adapter(model, params, out_dir, ttpu.LoraConfig(r=4, lora_alpha=8,
                                                              target_modules=("q_proj", "v_proj")))
    model2 = ttpu.AutoModelForCausalLM.from_pretrained(base_dir, dtype="float32")
    params2 = ttpu.load_adapter(model2, model2.params, out_dir)
    out = model2(params2, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(ref, out) < 1e-6


def test_lora_trainable_mask_and_training(lora_ckpt):
    base_dir, adapter_dir, _ = lora_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(base_dir, dtype="float32")
    params = ttpu.init_lora_params(model, model.params, ttpu.LoraConfig(r=4))
    mask = ttpu.lora_trainable_mask(params)
    from transformers_tpu.utils.generic import flatten_dict

    flat = flatten_dict(mask)
    assert flat["model.layers.0.self_attn.q_proj.lora_A"] is True
    assert flat["model.layers.0.self_attn.q_proj.weight"] is False
    # one masked optax step only changes lora leaves
    import jax
    import optax

    from transformers_tpu.peft import lora_optimizer

    opt = lora_optimizer(optax.sgd(1e-2), params)
    state = opt.init(params)

    def loss_fn(p):
        labels = jnp.asarray(IDS)
        return model(p, input_ids=jnp.asarray(IDS), labels=labels).loss

    grads = jax.grad(loss_fn)(params)
    updates, state = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    base_delta = float(jnp.abs(new_params["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]
                               - params["model"]["layers"]["0"]["self_attn"]["q_proj"]["weight"]).max())
    # at init lora_B == 0, so grad(lora_A) == 0 exactly; lora_B must move
    lora_delta = float(jnp.abs(new_params["model"]["layers"]["0"]["self_attn"]["q_proj"]["lora_B"]
                               - params["model"]["layers"]["0"]["self_attn"]["q_proj"]["lora_B"]).max())
    assert base_delta == 0.0
    assert lora_delta > 0.0
