"""Emu3 parity vs torch: llama text stack, video VQ-VAE, image BPE mapping."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _vq_cfg():
    return dict(codebook_size=32, embed_dim=4, latent_channels=4,
                temporal_downsample_factor=2, base_channels=32,
                channel_multiplier=[1, 2], num_res_blocks=1,
                attn_resolutions=[1], hidden_size=64, num_attention_heads=2)


def _text_cfg():
    return dict(vocab_size=160, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                rope_theta=10000.0, pad_token_id=0, bos_token_id=1,
                eos_token_id=2)


def _vocab_map():
    # 32 visual tokens -> BPE ids 100..131, image placeholder + EOL specials
    vm = {f"<|visual token {i:06d}|>": 100 + i for i in range(32)}
    vm["<image>"] = 90
    vm["<|extra_200|>"] = 91
    return vm


def test_emu3_text_causal_lm_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Emu3TextConfig(**_text_cfg(), attention_dropout=0.0)
    tm = transformers.Emu3ForCausalLM(cfg).eval()
    d = str(tmp_path / "emu3_text")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids = np.random.default_rng(0).integers(3, 160, size=(2, 9))
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out = m(m.params, input_ids=ids).logits
    assert max_abs_diff(out, ref) < 3e-5, max_abs_diff(out, ref)
    # greedy generate parity
    with torch.no_grad():
        tgen = tm.generate(torch.tensor(ids[:1]), max_new_tokens=6,
                           do_sample=False)
    import jax.numpy as jnp
    gen = m.generate(m.params, input_ids=jnp.asarray(ids[:1]),
                     max_new_tokens=6, prompt_pad_multiple=16)
    pad = 16 - ids.shape[1]  # generate left-pads the prompt to the bucket
    assert np.array_equal(np.asarray(gen)[0, pad:pad + tgen.shape[1]],
                          tgen[0].numpy())


def test_emu3_vqvae_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.Emu3VQVAEConfig(**_vq_cfg())
    tm = transformers.Emu3VQVAE(cfg).eval()
    d = str(tmp_path / "emu3_vq")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.emu3.modeling_emu3 import Emu3VQVAE
    m = Emu3VQVAE.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    px = np.random.default_rng(2).normal(size=(1, 3, 16, 16)).astype(np.float32)
    sizes = np.array([[16, 16]])
    with torch.no_grad():
        ref = tm.encode(torch.tensor(px), torch.tensor(sizes))
    out = m.encode(m.params, px, sizes)
    assert np.array_equal(np.asarray(out[0]), ref[0].numpy()), \
        (np.asarray(out[0]), ref[0].numpy())
    # decode parity on the quantized codes
    with torch.no_grad():
        dref = tm.decode(ref[0][None]).numpy()
    dout = m.decode(m.params, np.asarray(out[0])[None])
    assert max_abs_diff(dout, dref) < 1e-4, max_abs_diff(dout, dref)


def test_emu3_conditional_generation_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(3)
    cfg = transformers.Emu3Config(
        vq_config=_vq_cfg(),
        text_config=dict(**_text_cfg(), attention_dropout=0.0),
        vocabulary_map=_vocab_map())
    tm = transformers.Emu3ForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "emu3")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.emu3.modeling_emu3 import Emu3ForConditionalGeneration
    m = Emu3ForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    px = np.random.default_rng(4).normal(size=(1, 3, 16, 16)).astype(np.float32)
    sizes = np.array([[16, 16]])
    # image occupies (16/2)/... -> encode to get token grid incl. EOL column
    with torch.no_grad():
        tok = tm.model.vqmodel.encode(torch.tensor(px), torch.tensor(sizes))[0]
    n_img = tok.shape[0] * (tok.shape[1] + 1)
    ids = np.full((1, n_img + 3), 5, dtype=np.int64)
    ids[0, 0] = 1
    ids[0, 1:1 + n_img] = 90  # <image> placeholders
    # torch oracle: Emu3Model consumes pixel_values (the CG wrapper drops them)
    with torch.no_grad():
        hs = tm.model(input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
                      image_sizes=torch.tensor(sizes)).last_hidden_state
        ref = tm.lm_head(hs).numpy()
    out = m(m.params, input_ids=ids, pixel_values=px, image_sizes=sizes).logits
    assert max_abs_diff(out, ref) < 5e-5, max_abs_diff(out, ref)
