"""BLIP parity vs the torch reference on tiny random checkpoints."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def tiny_torch_blip(cls, vision_hidden=24):
    # VQA's answer decoder cross-attends the question states through the same
    # encoder_hidden_size projections, so there text width must equal vision
    # width (as in the released checkpoints); captioning exercises the
    # mismatched-width path.
    from transformers import BlipConfig

    cfg = BlipConfig(
        text_config=dict(vocab_size=99, hidden_size=32, encoder_hidden_size=vision_hidden,
                         intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=64, bos_token_id=97, sep_token_id=95,
                         pad_token_id=0, eos_token_id=98),
        vision_config=dict(hidden_size=vision_hidden, intermediate_size=48, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        image_text_hidden_size=16,
    )
    torch.manual_seed(0)
    return cls(cfg).eval()


@pytest.fixture(scope="module")
def pixel_values():
    rng = np.random.default_rng(0)
    return rng.normal(size=(2, 3, 32, 32)).astype(np.float32)


def test_blip_captioning_logits_loss_and_generate(tmp_path, pixel_values):
    from transformers import BlipForConditionalGeneration as TorchBlip

    tm = tiny_torch_blip(TorchBlip)
    tm.save_pretrained(tmp_path / "ckpt", safe_serialization=True)

    from transformers_tpu.models.blip import BlipForConditionalGeneration

    m = BlipForConditionalGeneration.from_pretrained(tmp_path / "ckpt", dtype="float32")

    input_ids = np.array([[97, 5, 8, 11], [97, 9, 3, 95]], dtype=np.int64)
    mask = np.ones_like(input_ids)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(pixel_values), input_ids=torch.tensor(input_ids),
                 attention_mask=torch.tensor(mask), labels=torch.tensor(input_ids))
    out = m(m.params, pixel_values=jnp.asarray(pixel_values), input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(mask), labels=jnp.asarray(input_ids))
    np.testing.assert_allclose(np.asarray(out.logits), ref.logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(float(out.loss), float(ref.loss), atol=1e-4)

    ref_ids = tm.generate(pixel_values=torch.tensor(pixel_values), max_new_tokens=6,
                          do_sample=False)
    ids = np.asarray(m.generate(m.params, pixel_values=jnp.asarray(pixel_values),
                                max_new_tokens=6, do_sample=False))
    ref_ids = ref_ids.numpy()
    n = min(ids.shape[1], ref_ids.shape[1])
    np.testing.assert_array_equal(ids[:, :n], ref_ids[:, :n])


def test_blip_vqa_loss_and_generate(tmp_path, pixel_values):
    from transformers import BlipForQuestionAnswering as TorchBlipVqa

    tm = tiny_torch_blip(TorchBlipVqa, vision_hidden=32)
    tm.save_pretrained(tmp_path / "ckpt", safe_serialization=True)

    from transformers_tpu.models.blip import BlipForQuestionAnswering

    m = BlipForQuestionAnswering.from_pretrained(tmp_path / "ckpt", dtype="float32")

    input_ids = np.array([[2, 5, 8, 95], [2, 9, 3, 95]], dtype=np.int64)
    mask = np.ones_like(input_ids)
    labels = np.array([[97, 7, 95], [97, 4, 95]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(input_ids), pixel_values=torch.tensor(pixel_values),
                 attention_mask=torch.tensor(mask), labels=torch.tensor(labels))
    out = m(m.params, input_ids=jnp.asarray(input_ids), pixel_values=jnp.asarray(pixel_values),
            attention_mask=jnp.asarray(mask), labels=jnp.asarray(labels))
    np.testing.assert_allclose(float(out.loss), float(ref.loss), atol=1e-4)

    ref_ids = tm.generate(input_ids=torch.tensor(input_ids),
                          pixel_values=torch.tensor(pixel_values),
                          attention_mask=torch.tensor(mask), max_new_tokens=5, do_sample=False)
    ids = np.asarray(m.generate(m.params, input_ids=jnp.asarray(input_ids),
                                pixel_values=jnp.asarray(pixel_values),
                                attention_mask=jnp.asarray(mask),
                                max_new_tokens=5, do_sample=False))
    n = min(ids.shape[1], ref_ids.shape[1])
    np.testing.assert_array_equal(ids[:, :n], ref_ids.numpy()[:, :n])


def test_blip_itm_scores(tmp_path, pixel_values):
    from transformers import BlipForImageTextRetrieval as TorchItm

    tm = tiny_torch_blip(TorchItm)
    tm.save_pretrained(tmp_path / "ckpt", safe_serialization=True)

    from transformers_tpu.models.blip import BlipForImageTextRetrieval

    m = BlipForImageTextRetrieval.from_pretrained(tmp_path / "ckpt", dtype="float32")

    input_ids = np.array([[2, 5, 8, 95], [2, 9, 3, 95]], dtype=np.int64)
    mask = np.ones_like(input_ids)
    with torch.no_grad():
        ref_itm = tm(input_ids=torch.tensor(input_ids), pixel_values=torch.tensor(pixel_values),
                     attention_mask=torch.tensor(mask))
        ref_cos = tm(input_ids=torch.tensor(input_ids), pixel_values=torch.tensor(pixel_values),
                     attention_mask=torch.tensor(mask), use_itm_head=False)
    out_itm = m(m.params, input_ids=jnp.asarray(input_ids),
                pixel_values=jnp.asarray(pixel_values), attention_mask=jnp.asarray(mask))
    out_cos = m(m.params, input_ids=jnp.asarray(input_ids),
                pixel_values=jnp.asarray(pixel_values), attention_mask=jnp.asarray(mask),
                use_itm_head=False)
    np.testing.assert_allclose(np.asarray(out_itm.itm_score), ref_itm.itm_score.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_cos.itm_score), ref_cos.itm_score.numpy(), atol=2e-4)


def test_blip_auto_classes(tmp_path, pixel_values):
    from transformers import BlipForConditionalGeneration as TorchBlip

    tm = tiny_torch_blip(TorchBlip)
    tm.save_pretrained(tmp_path / "ckpt", safe_serialization=True)

    import transformers_tpu as ttpu

    m = ttpu.AutoModelForImageTextToText.from_pretrained(tmp_path / "ckpt", dtype="float32")
    assert type(m).__name__ == "BlipForConditionalGeneration"
