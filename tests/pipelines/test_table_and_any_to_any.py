"""table-question-answering + any-to-any pipelines (reference
pipelines/__init__.py:141's last two missing tasks)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))
from test_serve import make_tiny_tokenizer  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TABLE = {"city": ["paris", "lyon", "nice"],
         "population": ["2000000", "500000", "300000"]}


@pytest.fixture(scope="module")
def tapas_model():
    from transformers_tpu.models.tapas import TapasConfig, TapasForQuestionAnswering

    cfg = TapasConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      num_aggregation_labels=4)
    m = TapasForQuestionAnswering(cfg, dtype="float32")
    import jax

    m.params = m.init(jax.random.key(0))
    return m


def test_tapas_table_encoder(tmp_path):
    make_tiny_tokenizer(str(tmp_path))
    tok = ttpu.AutoTokenizer.from_pretrained(str(tmp_path))
    from transformers_tpu.models.tapas.tokenization_tapas import TapasTableEncoder

    enc = TapasTableEncoder(tok).encode(TABLE, "which city is largest?")
    tt = enc["token_type_ids"][0]
    assert tt.shape[-1] == 7
    # question tokens are segment 0; cell tokens segment 1 with 1-based rows
    assert (tt[:, 0] == 1).any() and (tt[:, 0] == 0).any()
    cell_rows = tt[tt[:, 0] == 1][:, 2]
    assert cell_rows.max() == 3  # three data rows
    # numeric column got ranks
    pop_tokens = tt[(tt[:, 1] == 2) & (tt[:, 2] > 0)]
    assert set(pop_tokens[:, 4].tolist()) == {1, 2, 3}


def test_table_question_answering_pipeline(tmp_path, tapas_model):
    make_tiny_tokenizer(str(tmp_path))
    tok = ttpu.AutoTokenizer.from_pretrained(str(tmp_path))
    from transformers_tpu.pipelines.tasks import TableQuestionAnsweringPipeline

    pipe = TableQuestionAnsweringPipeline(model=tapas_model, tokenizer=tok)
    out = pipe(table=TABLE, query="which city is largest?")
    assert set(out) == {"answer", "coordinates", "cells", "aggregator"}
    assert out["aggregator"] in pipe.AGGREGATORS
    for r, c in out["coordinates"]:
        assert 0 <= r < 3 and 0 <= c < 2


def test_table_qa_registered_in_factory():
    from transformers_tpu.pipelines import SUPPORTED_TASKS, check_task

    assert check_task("table-question-answering")[1][1] == \
        "AutoModelForTableQuestionAnswering"
    assert "any-to-any" in SUPPORTED_TASKS
    assert len(SUPPORTED_TASKS) >= 30


def test_any_to_any_pipeline_text_mode(tmp_path):
    """Drive the omni path with a tiny Chameleon (image tokens + text in,
    text out) through the AnyToAnyPipeline."""
    make_tiny_tokenizer(str(tmp_path))
    tok = ttpu.AutoTokenizer.from_pretrained(str(tmp_path))
    from transformers_tpu.models.chameleon import (
        ChameleonConfig,
        ChameleonForConditionalGeneration,
        ChameleonImageProcessor,
        ChameleonProcessor,
    )
    from transformers_tpu.pipelines.tasks import AnyToAnyPipeline

    vmap = {"IMGIMG" + "".join(chr(ord("A") + int(d)) for d in str(i)) + "Z":
            tok.vocab_size + i for i in range(16)}
    vmap["<image>"] = tok.encode("@")[0]
    cfg = ChameleonConfig(
        vocab_size=tok.vocab_size + 64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, vocabulary_map=vmap,
        vq_config=dict(embed_dim=8, num_embeddings=16, latent_channels=8,
                       resolution=16, base_channels=32,
                       channel_multiplier=[1, 2], num_res_blocks=1,
                       attn_resolutions=[8]))
    import jax

    model = ChameleonForConditionalGeneration(cfg, dtype="float32")
    model.params = model.init(jax.random.key(0))
    proc = ChameleonProcessor(
        image_processor=ChameleonImageProcessor(size={"shortest_edge": 16},
                                                crop_size={"height": 16, "width": 16}),
        tokenizer=tok, image_seq_length=4, image_token="@")
    pipe = AnyToAnyPipeline(model=model, processor=proc)
    img = np.random.default_rng(0).integers(0, 256, (16, 16, 3), np.uint8)
    out = pipe(text="@ describe", images=[img], max_new_tokens=4,
               prompt_pad_multiple=8)
    assert isinstance(out[0]["generated_text"], str)
