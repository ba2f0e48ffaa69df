"""image-to-text + visual-question-answering pipelines on tiny BLIP checkpoints."""

import numpy as np
import pytest
import torch


def _save_blip(tmp_path, cls_name):
    import transformers as hf

    cfg = hf.BlipConfig(
        text_config=dict(vocab_size=40, hidden_size=32, encoder_hidden_size=24,
                         intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
                         bos_token_id=30, sep_token_id=3, pad_token_id=0, eos_token_id=31),
        vision_config=dict(hidden_size=24, intermediate_size=48, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8))
    if cls_name == "vqa":
        cfg.vision_config.hidden_size = 32
        cfg.text_config.encoder_hidden_size = 32
        torch.manual_seed(0)
        tm = hf.BlipForQuestionAnswering(cfg).eval()
    else:
        torch.manual_seed(0)
        tm = hf.BlipForConditionalGeneration(cfg).eval()
    tm.save_pretrained(tmp_path, safe_serialization=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"tok{i}" for i in range(25)] + \
        ["a", "picture", "of", "cats", "how", "many", "the", "two", "on", "couch"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    hf.BlipImageProcessor(size={"height": 32, "width": 32}).save_pretrained(tmp_path)
    return tm


@pytest.fixture()
def image():
    return (np.random.default_rng(0).random((48, 64, 3)) * 255).astype(np.uint8)


def test_image_to_text_pipeline(tmp_path, image):
    tm = _save_blip(tmp_path, "caption")
    from transformers_tpu.pipelines import pipeline

    pipe = pipeline("image-to-text", model=str(tmp_path))
    out = pipe(image, max_new_tokens=6)
    assert isinstance(out[0]["generated_text"], str)

    # greedy parity vs the torch oracle through the same processor
    inputs = pipe.processor(images=image, return_tensors="jax")
    tin = {k: torch.tensor(np.asarray(v)) for k, v in inputs.items()}
    ref = tm.generate(pixel_values=tin["pixel_values"], max_new_tokens=6, do_sample=False)
    ref_text = pipe.processor.tokenizer.decode([int(t) for t in ref[0]], skip_special_tokens=True)
    assert out[0]["generated_text"] == ref_text

    # prompted captioning
    # (in this toy vocab bos id 30 decodes to the word "a" rather than a
    # skipped special token, so the prompt appears after one leading "a")
    out2 = pipe({"image": image, "prompt": "a picture of"}, max_new_tokens=4)
    assert "a picture of" in out2[0]["generated_text"]


def test_vqa_pipeline(tmp_path, image):
    tm = _save_blip(tmp_path, "vqa")
    from transformers_tpu.pipelines import pipeline

    pipe = pipeline("vqa", model=str(tmp_path))
    out = pipe(image=image, question="how many cats?", max_new_tokens=4)
    assert isinstance(out[0]["answer"], str)

    inputs = pipe.processor(images=image, text="how many cats?", return_tensors="jax")
    tin = {k: torch.tensor(np.asarray(v)) for k, v in inputs.items()}
    ref = tm.generate(input_ids=tin["input_ids"], pixel_values=tin["pixel_values"],
                      attention_mask=tin["attention_mask"], max_new_tokens=4, do_sample=False)
    ref_text = pipe.processor.tokenizer.decode([int(t) for t in ref[0]], skip_special_tokens=True)
    assert out[0]["answer"] == ref_text
