"""Round-5 processor sweep batch 4: layout/document/prompt processors."""

import sys
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))
from test_serve import make_tiny_tokenizer  # noqa: E402


@pytest.fixture()
def tok(tmp_path):
    import transformers_tpu as ttpu

    make_tiny_tokenizer(str(tmp_path))
    return ttpu.AutoTokenizer.from_pretrained(str(tmp_path))


def _image(h=64, w=64, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_layoutlmv3_word_boxes(tok):
    from transformers_tpu.models.layoutlmv3 import LayoutLMv3Processor
    from transformers_tpu.models.vit import ViTImageProcessor

    proc = LayoutLMv3Processor(
        image_processor=ViTImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=tok)
    words = ["hello", "world"]
    boxes = [[10, 20, 30, 40], [50, 60, 70, 80]]
    out = proc(images=[_image()], text=words, boxes=boxes, return_tensors="np")
    ids = out["input_ids"][0]
    bbox = out["bbox"][0]
    assert bbox.shape[-1] == 4 and ids.shape[0] == bbox.shape[0]
    # every subword of "hello" carries hello's box; CLS gets [0,0,0,0]
    n_hello = len(tok.encode("hello", add_special_tokens=False))
    np.testing.assert_array_equal(bbox[0], [0, 0, 0, 0])
    for j in range(n_hello):
        np.testing.assert_array_equal(bbox[1 + j], boxes[0])
    # word_labels: first subtoken labeled, rest -100
    out2 = proc(images=[_image()], text=words, boxes=boxes,
                word_labels=[3, 7], return_tensors="np")
    labels = out2["labels"][0]
    assert labels[1] == 3
    assert (labels == 7).sum() == 1


def test_udop_no_cls_eos_box(tok):
    from transformers_tpu.models.udop import UdopProcessor

    proc = UdopProcessor(image_processor=None, tokenizer=tok)
    out = proc(text=[["a", "b"]], boxes=[[[1, 2, 3, 4], [5, 6, 7, 8]]],
               return_tensors="np")
    ids = out["input_ids"][0].tolist()
    assert ids[-1] == tok.eos_token_id
    np.testing.assert_array_equal(out["bbox"][0][-1], [1000, 1000, 1000, 1000])


def test_markuplm_html_to_xpaths(tok):
    from transformers_tpu.models.markuplm import (
        MarkupLMFeatureExtractor,
        MarkupLMProcessor,
    )

    html = "<html><body><div>hello</div><div><span>world</span></div></body></html>"
    fe = MarkupLMFeatureExtractor()
    ext = fe(html)
    assert ext["nodes"][0] == ["hello", "world"]
    assert ext["xpaths"][0][0] == "/html/body/div[1]"
    assert ext["xpaths"][0][1] == "/html/body/div[2]/span"

    tags_dict = {"html": 0, "body": 1, "div": 2, "span": 3}
    proc = MarkupLMProcessor(tokenizer=tok, tags_dict=tags_dict, max_depth=5)
    out = proc(html_strings=[html], return_tensors="np")
    assert out["xpath_tags_seq"].shape[-1] == 5
    # first token after CLS is "hello" -> xpath html/body/div[1] -> [0,1,2,pad..]
    row = out["xpath_tags_seq"][0][1]
    np.testing.assert_array_equal(row[:3], [0, 1, 2])
    assert row[3] == proc.pad_tag_id
    # second div carries subscript 2 (reference: bracket number as-is)
    sub_row = out["xpath_subs_seq"][0][1 + len(tok.encode("hello", add_special_tokens=False))]
    np.testing.assert_array_equal(sub_row[:4], [0, 0, 2, 0])


def test_markuplm_matches_reference_extractor():
    """Our html.parser walker vs the reference bs4 walker on nested HTML."""
    ref_fe = None
    try:
        ref_fe = transformers.MarkupLMFeatureExtractor()
        html = ("<html><body><p>one</p><div><p>two</p><p>three</p></div>"
                "</body></html>")
        r = ref_fe(html)
    except Exception as e:  # noqa: BLE001 — needs bs4
        pytest.skip(f"reference MarkupLMFeatureExtractor unavailable: {e}")
    from transformers_tpu.models.markuplm import MarkupLMFeatureExtractor

    o = MarkupLMFeatureExtractor()(html)
    assert o["nodes"] == r["nodes"]
    assert o["xpaths"] == r["xpaths"]


def test_pix2struct_flattened_patches_parity(tok):
    from transformers_tpu.models.pix2struct import (
        Pix2StructImageProcessor,
        Pix2StructProcessor,
    )

    img = _image(100, 160, seed=1)
    ours = Pix2StructImageProcessor(max_patches=64)
    o = ours([img], return_tensors="np")
    ref = transformers.Pix2StructImageProcessor(max_patches=64)
    r = ref(images=[img], return_tensors="np")
    assert o["flattened_patches"].shape == tuple(r["flattened_patches"].shape)
    np.testing.assert_array_equal(o["attention_mask"],
                                  np.asarray(r["attention_mask"]))
    # row/col ids identical; pixel payloads near (antialias differences)
    np.testing.assert_array_equal(o["flattened_patches"][..., :2],
                                  np.asarray(r["flattened_patches"])[..., :2])
    live = o["attention_mask"][0].astype(bool)
    diff = np.abs(o["flattened_patches"][0, live, 2:]
                  - np.asarray(r["flattened_patches"])[0, live, 2:]).mean()
    assert diff < 0.1, diff

    proc = Pix2StructProcessor(image_processor=ours, tokenizer=tok)
    out = proc(images=[img], text=["caption"], return_tensors="np")
    assert "flattened_patches" in out and "decoder_input_ids" in out


def test_sam_processor_rescales_prompts():
    from transformers_tpu.models.sam import SamImageProcessor, SamProcessor

    proc = SamProcessor(image_processor=SamImageProcessor(
        size={"longest_edge": 64}, mask_size={"longest_edge": 16}))
    img = _image(100, 200, seed=2)
    out = proc(images=[img], input_points=[[[[50, 50], [100, 25]]]],
               input_labels=[[[1, 0]]], input_boxes=[[[10, 10, 90, 90]]],
               return_tensors="np")
    # 200 -> 64 wide: scale = 0.32
    np.testing.assert_allclose(out["input_points"][0, 0, 0], [16, 16], atol=0.01)
    np.testing.assert_allclose(out["input_boxes"][0, 0],
                               [3.2, 3.2, 28.8, 28.8], atol=0.01)
    assert out["input_labels"].shape == (1, 1, 2)


def test_bark_processor_presets(tok, tmp_path):
    from transformers_tpu.models.bark import BarkProcessor

    proc = BarkProcessor(tokenizer=tok)
    preset = {"semantic_prompt": np.arange(5),
              "coarse_prompt": np.arange(10).reshape(2, 5),
              "fine_prompt": np.arange(20).reshape(4, 5)}
    out = proc(text=["hello"], voice_preset=preset, return_tensors="np")
    assert out["input_ids"].shape[1] == 256
    assert out["history_prompt"]["coarse_prompt"].shape == (2, 5)
    with pytest.raises(ValueError):
        proc(text=["x"], voice_preset={"semantic_prompt": np.arange(3)})


def test_auto_processor_layout_tier(tok, tmp_path):
    import transformers_tpu as ttpu
    from transformers_tpu.models.bros import BrosProcessor

    proc = BrosProcessor(tokenizer=tok)
    d = str(tmp_path / "bros")
    proc.save_pretrained(d)
    loaded = ttpu.AutoProcessor.from_pretrained(d)
    assert type(loaded).__name__ == "BrosProcessor"
