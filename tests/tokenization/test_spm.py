"""SentencePiece .model support: wire-format parse vs the protobuf oracle +
end-to-end encode parity vs the reference slow tokenizer."""

import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.tokenization.spm import parse_spm_model, spm_to_tokenizer_config  # noqa: E402

FIXTURE = "/root/reference/tests/fixtures/test_sentencepiece.model"


def test_wire_parse_matches_protobuf_oracle():
    from transformers.utils import sentencepiece_model_pb2_new as pb2

    data = open(FIXTURE, "rb").read()
    ours = parse_spm_model(data)
    ref = pb2.ModelProto()
    ref.ParseFromString(data)
    assert len(ours["pieces"]) == len(ref.pieces)
    for (p, s, t), rp in zip(ours["pieces"], ref.pieces):
        assert p == rp.piece and t == rp.type
        assert abs(s - rp.score) < 1e-6
    assert ours["model_type"] == ref.trainer_spec.model_type
    assert ours["add_dummy_prefix"] == ref.normalizer_spec.add_dummy_prefix
    assert ours["unk_id"] == ref.trainer_spec.unk_id


def test_engine_from_spm_encodes(tmp_path):
    from transformers_tpu.tokenization.engine import TokenizerEngine

    config = spm_to_tokenizer_config(open(FIXTURE, "rb").read())
    engine = TokenizerEngine(config)
    out = engine.encode("This is a test", add_special_tokens=False)["input_ids"]
    assert len(out) > 0
    text = engine.decode(out, skip_special_tokens=True)
    assert text == "This is a test"


def test_parity_vs_reference_tokenizer(tmp_path):
    """Our spm-built engine == the reference tokenizer (needs the
    sentencepiece lib as the oracle; skipped when absent)."""
    sentencepiece = pytest.importorskip("sentencepiece")
    sp = sentencepiece.SentencePieceProcessor(model_file=FIXTURE)

    from transformers_tpu.tokenization.engine import TokenizerEngine

    engine = TokenizerEngine(spm_to_tokenizer_config(open(FIXTURE, "rb").read()))
    for text in ["This is a test", "Hello world!", "unigram pieces 123"]:
        ours = engine.encode(text, add_special_tokens=False)["input_ids"]
        theirs = sp.encode(text)
        assert ours == theirs, (text, ours, theirs)


def test_tokenizer_from_pretrained_spm_dir(tmp_path):
    import transformers_tpu as ttpu

    d = str(tmp_path)
    shutil.copy(FIXTURE, str(Path(d) / "tokenizer.model"))
    import json

    (Path(d) / "tokenizer_config.json").write_text(json.dumps(
        {"bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>"}))
    tok = ttpu.PreTrainedTokenizer.from_pretrained(d)
    ids = tok.encode("hello world", add_special_tokens=False)
    assert isinstance(ids, list) and len(ids) > 0
    assert tok.decode(ids) == "hello world"
