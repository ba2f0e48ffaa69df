"""Round-5 processor sweep batch 2: VLM token-expansion tier.

Every processor's expansion count is checked against the reference formula
(and, where hub-free, against the installed reference processor's own
geometry helpers)."""

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


def _count(tok, out, token):
    tid = tok.encode(token)[0]
    return out["input_ids"][0].tolist().count(tid)


def test_chameleon_expansion(tok):
    from transformers_tpu.models.chameleon import ChameleonProcessor
    from transformers_tpu.models.chameleon.image_processing_chameleon import (
        ChameleonImageProcessor,
    )

    proc = ChameleonProcessor(
        image_processor=ChameleonImageProcessor(size={"shortest_edge": 32},
                                                crop_size={"height": 32, "width": 32}),
        tokenizer=tok, image_seq_length=7, image_token="@",
        image_start_token="#", image_end_token="!")
    out = proc(text="@ hi", images=[_image()], return_tensors="np")
    assert _count(tok, out, "@") == 7
    assert _count(tok, out, "#") == 1 and _count(tok, out, "!") == 1


def test_deepseek_vl_expansion(tok):
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.deepseek_vl import DeepseekVLProcessor

    proc = DeepseekVLProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok, num_image_tokens=9, image_token="@")
    out = proc(text="@ what", images=[_image()], return_tensors="np")
    assert _count(tok, out, "@") == 9


def test_instructblip_dual_tokenizers(tok):
    from transformers_tpu.models.blip import BlipImageProcessor
    from transformers_tpu.models.instructblip import InstructBlipProcessor

    proc = InstructBlipProcessor(
        image_processor=BlipImageProcessor(size={"height": 16, "width": 16}),
        tokenizer=tok, qformer_tokenizer=tok, num_query_tokens=5,
        image_token="@")
    out = proc(images=[_image()], text=["describe"], return_tensors="np")
    assert "qformer_input_ids" in out and "qformer_attention_mask" in out
    assert _count(tok, out, "@") == 5
    # qformer stream has NO image placeholders
    qid = tok.encode("@")[0]
    assert qid not in out["qformer_input_ids"][0].tolist()


def test_kosmos2_position_mask(tok):
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.kosmos2 import Kosmos2Processor

    proc = Kosmos2Processor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok, num_image_tokens=6, boi_token="#", eoi_token="!")
    out = proc(images=[_image()], text=["a photo"], return_tensors="np")
    mask = np.asarray(out["image_embeds_position_mask"])
    assert mask.sum() == 6
    ids = out["input_ids"][0].tolist()
    boi = tok.encode("#")[0]
    st = ids.index(boi) + 1
    assert mask[0, st:st + 6].tolist() == [1] * 6


def test_internvl_patch_scaled_expansion(tok):
    from transformers_tpu.models.got_ocr2 import GotOcr2ImageProcessor
    from transformers_tpu.models.internvl import InternVLProcessor

    proc = InternVLProcessor(
        image_processor=GotOcr2ImageProcessor(size={"height": 32, "width": 32},
                                              max_patches=6),
        tokenizer=tok, image_seq_length=4, image_token="@",
        start_image_token="#", end_image_token="!", fake_image_token="$")
    img = _image(100, 260, seed=1)
    out = proc(text="$ read this", images=[img], return_tensors="np")
    # reference num_patches for the same geometry
    ref = transformers.GotOcr2ImageProcessor(
        crop_to_patches=True, max_patches=6, size={"height": 32, "width": 32})
    n_ref = ref(images=[img], return_tensors="np")["pixel_values"].shape[0]
    assert _count(tok, out, "@") == 4 * n_ref


def test_aya_vision_tile_expansion(tok):
    from transformers_tpu.models.aya_vision import AyaVisionProcessor
    from transformers_tpu.models.got_ocr2 import GotOcr2ImageProcessor

    proc = AyaVisionProcessor(
        image_processor=GotOcr2ImageProcessor(size={"height": 28, "width": 28},
                                              max_patches=4),
        tokenizer=tok, image_token="$", img_size=28, patch_size=14,
        img_patch_token="@", start_of_img_token="#", end_of_img_token="!")
    img = _image(40, 150, seed=2)
    out = proc(text="$ look", images=[img], return_tensors="np")
    n = proc.image_processor([img], return_tensors="np",
                             crop_to_patches=True)["num_patches"][0]
    per_tile = (28 // 14) ** 2
    assert _count(tok, out, "@") == per_tile * n


def test_got_ocr2_crop_parity_and_prompt(tok):
    from transformers_tpu.models.got_ocr2 import (
        GotOcr2ImageProcessor,
        GotOcr2Processor,
    )

    img = _image(200, 500, seed=3)
    ours = GotOcr2ImageProcessor()([img], return_tensors="np",
                                   crop_to_patches=True, max_patches=6)
    ref = transformers.GotOcr2ImageProcessor(crop_to_patches=True, max_patches=6)(
        images=[img], return_tensors="np")
    assert ours["pixel_values"].shape == tuple(ref["pixel_values"].shape)
    assert np.abs(ours["pixel_values"] - np.asarray(ref["pixel_values"])).mean() < 1e-4

    proc = GotOcr2Processor(
        image_processor=GotOcr2ImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=tok, num_image_tokens=3)
    out = proc(images=[_image()], format=True, return_tensors="np")
    text = tok.decode(out["input_ids"][0])
    assert "OCRwithformat:" in text.replace(" ", "")
    assert text.count("<imgpad>") == 3


def test_glm4v_grid_expansion(tok):
    from transformers_tpu.models.glm4v import Glm4vProcessor
    from transformers_tpu.models.qwen2_vl import Qwen2VLImageProcessor

    ip = Qwen2VLImageProcessor(size={"shortest_edge": 56 * 56,
                                     "longest_edge": 28 * 28 * 128})
    proc = Glm4vProcessor(image_processor=ip, tokenizer=tok, image_token="@",
                          begin_image_token="#", end_image_token="!")
    img = _image(56, 56)
    out = proc(text="@ hi", images=[img], return_tensors="np")
    grid = np.asarray(proc.image_processor([img], return_tensors="np")["image_grid_thw"])
    want = int(np.prod(grid[0])) // ip.merge_size ** 2
    assert _count(tok, out, "@") == want


def test_idefics2_split_expansion(tok):
    from transformers_tpu.models.idefics2 import (
        Idefics2ImageProcessor,
        Idefics2Processor,
    )

    ip = Idefics2ImageProcessor(size={"shortest_edge": 24, "longest_edge": 48},
                                do_image_splitting=True)
    proc = Idefics2Processor(image_processor=ip, tokenizer=tok,
                             image_seq_len=3, image_token="@",
                             fake_image_token="#")
    out = proc(text="@ hello", images=[_image()], return_tensors="np")
    assert out["pixel_values"].shape[1] == 5  # 4 quadrants + original
    assert _count(tok, out, "@") == 3 * 5
    # adjacent fake tokens dedup: 5 blocks -> 6 fakes
    assert _count(tok, out, "#") == 6


def test_smolvlm_is_idefics3_format(tok):
    from transformers_tpu.models.idefics3.image_processing_idefics3 import (
        Idefics3ImageProcessor,
    )
    from transformers_tpu.models.smolvlm import SmolVLMProcessor

    proc = SmolVLMProcessor(
        image_processor=Idefics3ImageProcessor(
            size={"longest_edge": 64}, max_image_size={"longest_edge": 32}),
        tokenizer=tok, image_seq_len=2, image_token="@")
    out = proc(text="@ hi", images=[_image(100, 200, seed=4)],
               return_tensors="np")
    assert _count(tok, out, "@") >= 2  # split grid + global image


def test_llava_onevision_video_count(tok):
    from transformers_tpu.models.llava_next import LlavaNextImageProcessor
    from transformers_tpu.models.llava_onevision import (
        LlavaOnevisionProcessor,
        LlavaOnevisionVideoProcessor,
    )

    proc = LlavaOnevisionProcessor(
        image_processor=LlavaNextImageProcessor(),
        video_processor=LlavaOnevisionVideoProcessor(
            size={"height": 32, "width": 32}),
        tokenizer=tok, num_image_tokens=16, video_token="$")
    video = [_image(seed=i) for i in range(3)]
    out = proc(text="$ describe", videos=[video], return_tensors="np")
    # frames * ceil(sqrt(16)/2)^2 + 1 = 3*4+1
    assert _count(tok, out, "$") == 13
    assert out["pixel_values_videos"].shape[:2] == (1, 3)


def test_llava_next_video_count(tok):
    from transformers_tpu.models.llava_next import LlavaNextImageProcessor
    from transformers_tpu.models.llava_next_video import (
        LlavaNextVideoProcessor,
        LlavaNextVideoVideoProcessor,
    )

    proc = LlavaNextVideoProcessor(
        image_processor=LlavaNextImageProcessor(),
        video_processor=LlavaNextVideoVideoProcessor(
            size={"shortest_edge": 56}, crop_size={"height": 56, "width": 56}),
        tokenizer=tok, patch_size=14, video_token="$", image_token="@")
    video = [_image(seed=i) for i in range(2)]
    out = proc(text="$ what", videos=[video], return_tensors="np")
    per_frame = (56 // 14) ** 2
    assert _count(tok, out, "$") == per_frame // 4 * 2


def test_colpali_queries_and_maxsim(tok):
    from transformers_tpu.models.colpali import ColPaliProcessor
    from transformers_tpu.models.siglip.image_processing_siglip import (
        SiglipImageProcessor,
    )

    proc = ColPaliProcessor(
        image_processor=SiglipImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=tok)
    q = proc.process_queries(["what is this"], return_tensors="np")
    assert "input_ids" in q
    text = tok.decode(q["input_ids"][0])
    assert "Question:whatisthis" in text.replace(" ", "")
    p = proc.process_images([_image()], return_tensors="np")
    assert "pixel_values" in p and "input_ids" in p

    # MaxSim: orthogonal vectors score by construction
    qe = [np.eye(2, 4, dtype=np.float32)]           # 2 query tokens
    pe = [np.eye(3, 4, dtype=np.float32),           # matches both -> 2.0
          np.zeros((3, 4), np.float32)]             # matches none -> 0.0
    scores = proc.score_retrieval(qe, pe)
    np.testing.assert_allclose(scores, [[2.0, 0.0]])


def test_llama4_tile_prompt(tok):
    from transformers_tpu.models.got_ocr2 import GotOcr2ImageProcessor
    from transformers_tpu.models.llama4 import Llama4Processor

    proc = Llama4Processor(
        image_processor=GotOcr2ImageProcessor(size={"height": 28, "width": 28},
                                              max_patches=4),
        tokenizer=tok, patch_size=14, pixel_shuffle_ratio=0.5)
    img = _image(30, 110, seed=5)
    out = proc(text="<|image|> hi", images=[img], return_tensors="np")
    n = proc.image_processor([img], return_tensors="np",
                             crop_to_patches=True)["num_patches"][0]
    npc = (28 // 14) ** 2 // 4  # pixel-shuffle 0.5 -> /4
    n_tiles = n - 1 if n > 1 else 1
    want = (n_tiles + 1) * npc if n > 1 else npc
    decoded = tok.decode(out["input_ids"][0])
    assert decoded.count("<|patch|>") == want


def test_emu3_expansion_matches_image_sizes(tok):
    from transformers_tpu.models.emu3 import Emu3ImageProcessor, Emu3Processor

    proc = Emu3Processor(
        image_processor=Emu3ImageProcessor(min_pixels=32 * 32,
                                           max_pixels=64 * 64),
        tokenizer=tok, downsample_ratio=8, image_token="@",
        image_start_token="#", image_end_token="!",
        fake_token_around_image="%", eof_token="&")
    img = _image(64, 64, seed=6)
    out = proc(text="@ gen", images=[img], return_tensors="np")
    h, w = np.asarray(out["image_sizes"])[0] // 8
    assert _count(tok, out, "@") == int(h) * (int(w) + 1)


def test_fuyu_raster_prefix(tok):
    from transformers_tpu.models.fuyu import FuyuImageProcessor, FuyuProcessor

    proc = FuyuProcessor(
        image_processor=FuyuImageProcessor(size={"height": 60, "width": 90},
                                           patch_size=30),
        tokenizer=tok, image_placeholder="@", image_newline="$")
    img = _image(60, 90, seed=7)
    out = proc(text=["what"], images=[img], return_tensors="np")
    assert _count(tok, out, "@") == 2 * 3  # 2 rows x 3 cols
    assert _count(tok, out, "$") == 2
    assert out["image_patches"].shape == (1, 6, 30 * 30 * 3)


def test_auto_processor_roundtrip_batch2(tok, tmp_path):
    import transformers_tpu as ttpu
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.deepseek_vl import DeepseekVLProcessor

    proc = DeepseekVLProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok, num_image_tokens=4)
    d = str(tmp_path / "dsvl")
    proc.save_pretrained(d)
    loaded = ttpu.AutoProcessor.from_pretrained(d)
    assert type(loaded).__name__ == "DeepseekVLProcessor"
    assert loaded.num_image_tokens == 4
