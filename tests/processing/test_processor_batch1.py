"""Round-5 processor sweep batch 1: dual encoders, OCR/doc, detection.

Each processor composes a tiny tokenizer with its family image processor;
behavior parity is checked against the installed reference where it is
hub-free (token2json, nested owl queries, mgp-str head fusion)."""

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


def _image(h=48, w=64, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_trivial_combiners_emit_joint_features(tok):
    """align/altclip/chinese_clip/git/flava/vtde: text+image -> input_ids +
    pixel_values in one BatchFeature."""
    from transformers_tpu.models.align import AlignProcessor
    from transformers_tpu.models.altclip import AltCLIPProcessor
    from transformers_tpu.models.chinese_clip import ChineseCLIPProcessor
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.flava import FlavaProcessor
    from transformers_tpu.models.git import GitProcessor
    from transformers_tpu.models.vision_text_dual_encoder import (
        VisionTextDualEncoderProcessor,
    )

    ip = CLIPImageProcessor(size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32})
    for cls in (AltCLIPProcessor, ChineseCLIPProcessor, GitProcessor,
                FlavaProcessor, VisionTextDualEncoderProcessor):
        proc = cls(image_processor=ip, tokenizer=tok)
        out = proc(text=["hello world"], images=[_image()], return_tensors="np")
        assert "input_ids" in out and "pixel_values" in out, cls.__name__
        assert out["pixel_values"].shape[-2:] == (32, 32)
    # align defaults to padding="max_length", max_length=64 (reference
    # processing_align.py)
    proc = AlignProcessor(image_processor=ip, tokenizer=tok)
    out = proc(text=["hello"], images=[_image()], return_tensors="np")
    assert out["input_ids"].shape[1] == 64


def test_vilt_and_bridgetower_pixel_mask(tok):
    from transformers_tpu.models.bridgetower import (
        BridgeTowerImageProcessor,
        BridgeTowerProcessor,
    )
    from transformers_tpu.models.vilt import ViltImageProcessor, ViltProcessor

    p1 = ViltProcessor(image_processor=ViltImageProcessor(size={"shortest_edge": 64}),
                       tokenizer=tok)
    out = p1(text=["a cat"], images=[_image(100, 60)], return_tensors="np")
    assert set(out.keys()) >= {"input_ids", "pixel_values", "pixel_mask"}

    p2 = BridgeTowerProcessor(image_processor=BridgeTowerImageProcessor(), tokenizer=tok)
    out = p2(text=["a cat"], images=[_image(100, 60)], return_tensors="np")
    assert out["pixel_values"].shape[-2:] == (288, 288)


def test_bridgetower_image_processor_parity():
    ref = transformers.BridgeTowerImageProcessor()
    from transformers_tpu.models.bridgetower import BridgeTowerImageProcessor

    ours = BridgeTowerImageProcessor()
    for shape in [(100, 60), (300, 480), (288, 288)]:
        img = _image(*shape, seed=3)
        r = ref(images=[img], return_tensors="np")
        o = ours([img], return_tensors="np")
        assert o["pixel_values"].shape == r["pixel_values"].shape
        assert np.abs(o["pixel_values"] - r["pixel_values"]).mean() < 0.05


def test_xclip_videos_route_through_image_processor(tok):
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.x_clip import XCLIPProcessor

    proc = XCLIPProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok)
    video = [_image(seed=i) for i in range(4)]
    out = proc(text=["a dog"], videos=[video], return_tensors="np")
    assert out["pixel_values"].shape == (4, 3, 32, 32)


def test_owlvit_nested_queries_stack(tok):
    from transformers_tpu.models.owlvit import OwlViTProcessor
    from transformers_tpu.models.owlvit.image_processing_owlvit import (
        OwlViTImageProcessor,
    )

    proc = OwlViTProcessor(image_processor=OwlViTImageProcessor(), tokenizer=tok)
    # two images, 2 and 1 queries: padded to 2 each -> 4 rows
    out = proc(text=[["a cat", "a dog"], ["a bird"]],
               images=[_image(), _image(seed=1)], return_tensors="np")
    assert out["input_ids"].shape[0] == 4
    assert out["pixel_values"].shape[0] == 2
    # query images produce query_pixel_values
    out2 = proc(images=[_image()], query_images=[_image(seed=2)],
                return_tensors="np")
    assert "query_pixel_values" in out2 and "pixel_values" in out2


def test_owlv2_is_owlvit_compatible(tok):
    from transformers_tpu.models.owlv2 import Owlv2Processor
    from transformers_tpu.models.owlv2.image_processing_owlv2 import (
        Owlv2ImageProcessor,
    )

    proc = Owlv2Processor(image_processor=Owlv2ImageProcessor(), tokenizer=tok)
    out = proc(text=["x"], images=[_image()], return_tensors="np")
    assert "pixel_values" in out and "input_ids" in out


def test_donut_token2json_matches_reference(tok):
    from transformers_tpu.models.donut import DonutProcessor

    ours = DonutProcessor(tokenizer=tok)
    added = {"<advanced/>": 57529}

    class _Stub:
        token2json = transformers.DonutProcessor.token2json

        class tokenizer:  # noqa: N801
            @staticmethod
            def get_added_vocab():
                return added

    ref = transformers.DonutProcessor.token2json
    for seq in [
        "<s_menu><s_nm>Latte</s_nm><s_price>4.50</s_price></s_menu>",
        "<s_items><s_it><s_nm>A</s_nm></s_it><sep/><s_it><s_nm>B</s_nm></s_it></s_items>",
        "<s_level><advanced/></s_level>",
        "plain text no tags",
        "<s_a>one<sep/>two</s_a>",
        "<s_outer><s_inner>v</s_inner></s_outer>",
    ]:
        want = ref(_Stub(), seq, added_vocab=added)
        got = ours.token2json(seq, added_vocab=added)
        assert got == want, (seq, got, want)


def test_trocr_and_donut_labels(tok):
    from transformers_tpu.models.donut import DonutProcessor
    from transformers_tpu.models.donut.image_processing_donut import (
        DonutImageProcessor,
    )
    from transformers_tpu.models.trocr import TrOCRProcessor
    from transformers_tpu.models.vit import ViTImageProcessor

    p = TrOCRProcessor(image_processor=ViTImageProcessor(size={"height": 32, "width": 32}),
                       tokenizer=tok)
    out = p(images=[_image()], text=["hello"], return_tensors="np")
    assert "labels" in out and "pixel_values" in out

    d = DonutProcessor(image_processor=DonutImageProcessor(
        size={"height": 32, "width": 32}), tokenizer=tok)
    out = d(images=[_image()], text=["<s_nm>x</s_nm>"], return_tensors="np")
    assert "labels" in out


def test_mgp_str_fusion_picks_best_head(tok):
    from transformers_tpu.models.mgp_str import MgpstrProcessor

    class CharTok:
        def convert_ids_to_tokens(self, ids):
            table = {0: "[GO]", 1: "[s]", 2: "a", 3: "b", 4: "c"}
            return [table.get(int(i), "?") for i in ids]

    proc = MgpstrProcessor(tokenizer=CharTok())
    # char logits [B=1, L=4, V=5]: BOS slot + "ab" + EOS, confident
    logits = np.full((1, 4, 5), -10.0, np.float32)
    logits[0, 0, 0] = 10
    logits[0, 1, 2] = 10  # a
    logits[0, 2, 3] = 10  # b
    logits[0, 3, 1] = 10  # [s]
    out = proc.batch_decode((logits, np.zeros((1, 4, 5), np.float32),
                             np.zeros((1, 4, 5), np.float32)))
    assert out["generated_text"] == ["ab"]
    assert out["char_preds"] == ["ab"]
    assert out["scores"][0] > 0.9


def test_clipseg_visual_prompt(tok):
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.clipseg import CLIPSegProcessor

    proc = CLIPSegProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok)
    out = proc(images=[_image()], visual_prompt=[_image(seed=1)],
               return_tensors="np")
    assert "conditional_pixel_values" in out
    with pytest.raises(ValueError):
        proc(text=["x"], visual_prompt=[_image()], images=[_image()])


def test_auto_processor_roundtrip_batch1(tok, tmp_path):
    """save_pretrained + AutoProcessor.from_pretrained resolves the right
    class via processor_config.json."""
    import transformers_tpu as ttpu
    from transformers_tpu.models.clip import CLIPImageProcessor
    from transformers_tpu.models.git import GitProcessor

    proc = GitProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok)
    d = str(tmp_path / "git")
    proc.save_pretrained(d)
    loaded = ttpu.AutoProcessor.from_pretrained(d)
    assert type(loaded).__name__ == "GitProcessor"
    out = loaded(text=["hi"], images=[_image()], return_tensors="np")
    assert "pixel_values" in out and "input_ids" in out
