"""VLM processor stacks: Gemma3, LLaVA-NeXT (anyres), BLIP-2, PaliGemma —
image-processor parity vs the installed reference + token-expansion checks."""

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


def _image(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# --------------------------------------------------------------- gemma3
def test_gemma3_image_processor_parity():
    ref = transformers.Gemma3ImageProcessor(
        do_pan_and_scan=True, pan_and_scan_min_crop_size=50,
        pan_and_scan_max_num_crops=4, pan_and_scan_min_ratio_to_activate=1.2)
    from transformers_tpu.models.gemma3 import Gemma3ImageProcessor

    ours = Gemma3ImageProcessor(
        do_pan_and_scan=True, pan_and_scan_min_crop_size=50,
        pan_and_scan_max_num_crops=4, pan_and_scan_min_ratio_to_activate=1.2)
    for shape in [(64, 200), (220, 65), (100, 100)]:
        img = _image(*shape)
        r = ref(images=[img], return_tensors="np")
        o = ours([img], return_tensors="np")
        np.testing.assert_array_equal(np.asarray(o["num_crops"]),
                                      np.asarray(r["num_crops"]))
        assert o["pixel_values"].shape == r["pixel_values"].shape
        assert np.abs(o["pixel_values"] - r["pixel_values"]).mean() < 0.1


def test_gemma3_processor_expansion(tok):
    from transformers_tpu.models.gemma3 import Gemma3ImageProcessor, Gemma3Processor

    proc = Gemma3Processor(
        image_processor=Gemma3ImageProcessor(
            size={"height": 32, "width": 32}, do_pan_and_scan=True,
            pan_and_scan_min_crop_size=50, pan_and_scan_max_num_crops=4,
            pan_and_scan_min_ratio_to_activate=1.2),
        tokenizer=tok, image_seq_length=7, boi_token="@", eoi_token="!",
        image_token="#")
    # wide image -> pan-and-scan crops; each boi expands to 7 image tokens
    out = proc(text="@ hello", images=[_image(64, 200)], return_tensors="np")
    hash_id = tok.encode("#")[0]
    n_pieces = out["pixel_values"].shape[0]
    assert n_pieces > 1  # thumbnail + crops
    assert out["input_ids"][0].tolist().count(hash_id) == 7 * n_pieces


# ----------------------------------------------------------- llava-next
def test_llava_next_image_processor_parity():
    ref = transformers.LlavaNextImageProcessor()
    from transformers_tpu.models.llava_next import LlavaNextImageProcessor

    ours = LlavaNextImageProcessor()
    for shape in [(400, 640), (900, 300), (336, 336)]:
        img = _image(*shape, seed=5)
        r = ref(images=[img], return_tensors="np")
        o = ours([img], return_tensors="np")
        np.testing.assert_array_equal(np.asarray(o["image_sizes"]),
                                      np.asarray(r["image_sizes"]))
        assert o["pixel_values"].shape == r["pixel_values"].shape
        assert np.abs(o["pixel_values"] - r["pixel_values"]).mean() < 0.1


def test_llava_next_processor_token_count_matches_reference(tok):
    """Our expansion count must equal the reference processor's for the same
    geometry (the v4 _get_number_of_features contract)."""
    from transformers_tpu.models.llava_next import (
        LlavaNextImageProcessor,
        LlavaNextProcessor,
    )

    ours = LlavaNextProcessor(
        image_processor=LlavaNextImageProcessor(), tokenizer=tok,
        patch_size=14, vision_feature_select_strategy="default",
        image_token="@")
    img = _image(400, 640, seed=2)
    out = ours(text="@ what is this", images=[img], return_tensors="np")
    at_id = tok.encode("@")[0]
    got = out["input_ids"][0].tolist().count(at_id)

    # avoid needing a hub tokenizer: call the reference feature-count method
    # unbound with a stand-in carrying the same grid pinpoints
    class _Stub:
        image_processor = transformers.LlavaNextImageProcessor()
        patch_size = 14
        num_additional_image_tokens = 1
        _get_unpadded_features = transformers.LlavaNextProcessor._get_unpadded_features

    # geometry (224, 224) = the processed patch size with default crop_size
    want = transformers.LlavaNextProcessor._get_number_of_features(
        _Stub(), 400, 640, 224, 224) - 1
    assert got == want, (got, want)


# --------------------------------------------------------------- blip-2
def test_blip2_processor(tok):
    from transformers_tpu.models.blip import BlipImageProcessor
    from transformers_tpu.models.blip_2 import Blip2Processor

    proc = Blip2Processor(
        image_processor=BlipImageProcessor(size={"height": 16, "width": 16}),
        tokenizer=tok, num_query_tokens=5, image_token="@")
    out = proc(text="hi there", images=[_image(20, 20)], return_tensors="np")
    at_id = tok.encode("@")[0]
    ids = out["input_ids"][0].tolist()
    assert ids[:5] == [at_id] * 5  # image tokens first, before everything
    assert out["pixel_values"].shape == (1, 3, 16, 16)


# ------------------------------------------------------------- paligemma
def test_paligemma_processor(tok):
    from transformers_tpu.models.paligemma import PaliGemmaProcessor
    from transformers_tpu.models.siglip import SiglipImageProcessor

    tok.bos_token = "!"
    proc = PaliGemmaProcessor(
        image_processor=SiglipImageProcessor(size={"height": 16, "width": 16}),
        tokenizer=tok, image_seq_length=6)
    proc.image_token = "@"
    globals()  # keep lint quiet
    # patch module-level token for the test tokenizer's vocab
    import transformers_tpu.models.paligemma.processing_paligemma as P

    old = P.IMAGE_TOKEN
    P.IMAGE_TOKEN = "@"
    try:
        out = proc(text="answer en what?", images=[_image(20, 20)],
                   return_tensors="np")
        at_id = tok.encode("@")[0]
        ids = out["input_ids"][0].tolist()
        assert ids[:6] == [at_id] * 6  # image tokens prefix
        bos_id = tok.encode("!")[0]
        assert ids[6] == bos_id  # then BOS
    finally:
        P.IMAGE_TOKEN = old


# ---------------------------------------------------------- auto routing
def test_auto_processor_roundtrip(tok, tmp_path):
    from transformers_tpu.models.gemma3 import Gemma3ImageProcessor, Gemma3Processor

    proc = Gemma3Processor(image_processor=Gemma3ImageProcessor(),
                           tokenizer=tok, image_seq_length=3)
    d = str(tmp_path / "g3")
    proc.save_pretrained(d)
    import transformers_tpu as ttpu

    loaded = ttpu.AutoProcessor.from_pretrained(d)
    assert type(loaded).__name__ == "Gemma3Processor"
    assert loaded.image_seq_length == 3


# --------------------------------------------------------------- pixtral
def test_pixtral_image_processor_parity():
    ref = transformers.PixtralImageProcessor(size={"longest_edge": 256})
    from transformers_tpu.models.pixtral import PixtralImageProcessor

    ours = PixtralImageProcessor(size={"longest_edge": 256})
    for shape in [(300, 500), (100, 80)]:
        img = _image(*shape, seed=9)
        r = ref(images=[img], return_tensors="np")
        o = ours([img], return_tensors="np")
        r_px = np.asarray(r["pixel_values"])
        if r_px.ndim == 3:  # some versions return a list of [C,H,W]
            r_px = r_px[None]
        np.testing.assert_array_equal(np.asarray(o["image_sizes"]),
                                      np.asarray(r["image_sizes"]))
        assert np.abs(o["pixel_values"] - r_px).mean() < 0.1


def test_pixtral_processor_grid_expansion(tok):
    from transformers_tpu.models.pixtral import (
        PixtralImageProcessor,
        PixtralProcessor,
    )

    proc = PixtralProcessor(
        image_processor=PixtralImageProcessor(size={"longest_edge": 64}),
        tokenizer=tok, patch_size=16, image_token="@",
        image_break_token="#", image_end_token="!")
    img = _image(64, 32, seed=1)
    out = proc(text="@ hi", images=[img], return_tensors="np")
    h, w = np.asarray(out["image_sizes"])[0]
    nh, nw = h // 16, w // 16
    ids = out["input_ids"][0].tolist()
    assert ids.count(tok.encode("@")[0]) == nh * nw
    assert ids.count(tok.encode("#")[0]) == nh - 1
    assert ids.count(tok.encode("!")[0]) == 1


# --------------------------------------------------------------- idefics3
def test_idefics3_image_processor_parity():
    ref = transformers.Idefics3ImageProcessor(
        size={"longest_edge": 2 * 100}, max_image_size={"longest_edge": 100})
    from transformers_tpu.models.idefics3 import Idefics3ImageProcessor

    ours = Idefics3ImageProcessor(
        size={"longest_edge": 2 * 100}, max_image_size={"longest_edge": 100})
    img = _image(250, 180, seed=4)
    r = ref(images=[[img]], return_tensors="np")
    o = ours([img], return_tensors="np")
    assert o["pixel_values"].shape == np.asarray(r["pixel_values"]).shape
    assert np.abs(o["pixel_values"] - np.asarray(r["pixel_values"])).mean() < 0.1


def test_idefics3_processor_split_expansion(tok):
    from transformers_tpu.models.idefics3 import (
        Idefics3ImageProcessor,
        Idefics3Processor,
    )

    proc = Idefics3Processor(
        image_processor=Idefics3ImageProcessor(
            size={"longest_edge": 200}, max_image_size={"longest_edge": 100}),
        tokenizer=tok, image_seq_len=4, fake_image_token="#",
        image_token="@", global_image_tag="!")
    img = _image(250, 180, seed=4)
    out = proc(text="@ what", images=[img], return_tensors="np")
    ids = out["input_ids"][0].tolist()
    # 2x2 grid + global -> 5 frames x 4 tokens
    assert ids.count(tok.encode("@")[0]) == 5 * 4


# ----------------------------------------------------------------- mllama
def test_mllama_image_processor_parity():
    ref = transformers.MllamaImageProcessor(
        size={"height": 64, "width": 64}, max_image_tiles=4)
    from transformers_tpu.models.mllama import MllamaImageProcessor

    ours = MllamaImageProcessor(size={"height": 64, "width": 64},
                                max_image_tiles=4)
    for shape in [(100, 200), (60, 60), (260, 80)]:
        img = _image(*shape, seed=6)
        r = ref(images=[[img]], return_tensors="np")
        o = ours([img], return_tensors="np")
        np.testing.assert_array_equal(np.asarray(o["aspect_ratio_ids"]),
                                      np.asarray(r["aspect_ratio_ids"]))
        np.testing.assert_array_equal(np.asarray(o["aspect_ratio_mask"]),
                                      np.asarray(r["aspect_ratio_mask"]))
        assert o["pixel_values"].shape == np.asarray(r["pixel_values"]).shape
        assert np.abs(o["pixel_values"]
                      - np.asarray(r["pixel_values"])).mean() < 0.1
