"""Chat response parsing (reference src/transformers/utils/chat_parsing/)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.utils.chat_parsing import (  # noqa: E402
    ResponseParser,
    parse_response,
)

def _tmpl():
    """A DeepSeek-R1-style template: implicit content sink, a <think>
    reasoning region pre-opened by the chat template, and XML-wrapped JSON
    tool calls. Fresh dict each call (parsers must not mutate the spec)."""
    return {
        "start_anchor": "<｜Assistant｜>",
        "defaults": {"role": "assistant"},
        "fields": {
            "content": {},
            "thinking": {"open": "<think>", "close": "</think>"},
            "tool_calls": {
                "open": "<tool_call>",
                "close": "</tool_call>",
                "content": "json",
                "repeats": True,
            },
        },
    }


def test_basic_regions():
    msg = parse_response(
        "<think>step by step</think>The answer is 4.",
        _tmpl(), prefix="")
    assert msg["role"] == "assistant"
    assert msg["thinking"] == "step by step"
    assert msg["content"] == "The answer is 4."


def test_prefix_preopens_region():
    # chat template emitted the opening <think> tag in the prefill
    prefix = "<｜User｜>hi<｜Assistant｜><think>"
    p = ResponseParser(_tmpl(), prefix=prefix)
    assert any(e["type"] == "region_open" and e["field"] == "thinking"
               for e in p.initial_events)
    p.feed("pondering</think>ok")
    msg, _ = p.finalize()
    assert msg["thinking"] == "pondering"
    assert msg["content"] == "ok"


def test_prefix_truncates_to_last_anchor():
    prefix = "<｜Assistant｜>old turn<｜User｜>again<｜Assistant｜>"
    msg = parse_response("fresh reply", _tmpl(), prefix=prefix)
    assert msg["content"] == "fresh reply"


def test_repeating_json_tool_calls():
    text = ('<tool_call>{"name": "add", "arguments": {"a": "2", "b": "3"}}</tool_call>'
            '<tool_call>{"name": "neg", "arguments": {"x": "7"}}</tool_call>')
    msg = parse_response(text, _tmpl(), prefix="")
    assert [c["name"] for c in msg["tool_calls"]] == ["add", "neg"]
    # without tools= the string args stay strings
    assert msg["tool_calls"][0]["arguments"]["a"] == "2"


def test_tool_argument_coercion():
    def add(a: int, b: int):
        """Add numbers.

        Args:
            a: first
            b: second
        """
        return a + b

    text = '<tool_call>{"name": "add", "arguments": {"a": "2", "b": "3"}}</tool_call>'
    # coercion applies to {"function": {name, arguments}} shaped values; the
    # transform reshapes the raw JSON object into the OpenAI tool-call form
    tmpl = _tmpl()
    tmpl["fields"]["tool_calls"]["transform"] = {
        "type": "function",
        "function": "{content}",
    }
    msg = parse_response(text, tmpl, prefix="", tools=[add])
    fn = msg["tool_calls"][0]["function"]
    assert fn["arguments"] == {"a": 2, "b": 3}


def test_streaming_equals_oneshot():
    text = "<think>ab cd</think>hello <tool_call>" \
           '{"name": "f", "arguments": {}}</tool_call> bye'
    one = parse_response(text, _tmpl(), prefix="")
    p = ResponseParser(_tmpl(), prefix="")
    events = []
    for i in range(0, len(text), 3):  # ragged chunks split delimiters
        events += p.feed(text[i:i + 3])
    msg, tail = p.finalize()
    events += tail
    assert msg == one
    # streamed thinking chunks concatenate to the parsed value
    streamed = "".join(e["text"] for e in events
                       if e["type"] == "region_chunk" and e["field"] == "thinking")
    assert streamed == "ab cd"
    # no partial delimiter bytes ever leaked into content chunks
    for e in events:
        if e["type"] == "region_chunk":
            assert "<think" not in e["text"] and "</think" not in e["text"]


def test_partial_delimiter_held_back():
    p = ResponseParser(_tmpl(), prefix="")
    ev = p.feed("hello <thi")
    # "<thi" could become "<think>": must be held, "hello " may stream
    chunks = "".join(e["text"] for e in ev if e["type"] == "region_chunk")
    assert chunks == "hello "
    ev = p.feed("s is not a tag")
    chunks = "".join(e["text"] for e in ev if e["type"] == "region_chunk")
    assert chunks.startswith("<this is not a ta")  # released once disambiguated
    msg, _ = p.finalize()
    assert msg["content"] == "hello <this is not a tag"


def test_required_field_missing_raises():
    tmpl = _tmpl()
    tmpl["fields"]["thinking"]["optional"] = False
    p = ResponseParser(tmpl, prefix="")
    p.feed("no reasoning here")
    with pytest.raises(ValueError, match="thinking"):
        p.finalize()


def test_template_validation():
    with pytest.raises(ValueError, match="start_anchor"):
        parse_response("x", {"fields": {"content": {}}}, prefix="")
    with pytest.raises(ValueError, match="unknown content parser"):
        parse_response("x", {"start_anchor": "a",
                             "fields": {"c": {"content": "nope"}}}, prefix="")
    with pytest.raises(ValueError, match="implicit"):
        parse_response("x", {"start_anchor": "a",
                             "fields": {"c": {}, "d": {}}}, prefix="")
    with pytest.raises(ValueError):
        parse_response("x", _tmpl() | {"bogus_key": 1}, prefix="")


def test_prefix_required():
    with pytest.raises(ValueError, match="prefix"):
        parse_response("x", _tmpl())


def test_kv_lines_and_xml_inline():
    tmpl = {
        "start_anchor": "<s>",
        "fields": {
            "content": {},
            "meta": {"open": "<meta>", "close": "</meta>", "content": "kv-lines"},
            "args": {"open": "<args>", "close": "</args>", "content": "xml-inline",
                     "content_args": {
                         "tag_pattern": r"<(?P<key>\w+)>(?P<value>.*?)</(?P=key)>"}},
        },
    }
    msg = parse_response(
        "<meta>lang: en\nscore: 3</meta><args><x>1</x><y>two</y></args>done",
        tmpl, prefix="")
    assert msg["meta"] == {"lang": "en", "score": "3"}
    assert msg["args"] == {"x": "1", "y": "two"}
    assert msg["content"] == "done"


def test_lax_json_dialects():
    tmpl = {
        "start_anchor": "<s>",
        "fields": {
            "content": {},
            "call": {"open": "[CALL]", "close": "[/CALL]", "content": "json",
                     "content_args": {"unquoted_keys": True}},
        },
    }
    msg = parse_response('[CALL]{name: "f", args: {x: "1"}}[/CALL]', tmpl, prefix="")
    assert msg["call"] == {"name": "f", "args": {"x": "1"}}


def test_tokenizer_integration(tmp_path):
    from transformers_tpu.tokenization.base import PreTrainedTokenizer
    from transformers_tpu.tokenization.engine import TokenizerEngine

    vocab = {chr(c): i for i, c in enumerate(range(32, 127))}
    engine = TokenizerEngine({
        "model": {"type": "WordLevel", "vocab": vocab, "unk_token": " "},
        "pre_tokenizer": {"type": "Split", "pattern": {"String": ""},
                          "behavior": "Isolated"},
    })
    tok = PreTrainedTokenizer(engine, tokenizer_config={
        "response_template": _tmpl()})
    msg = tok.parse_response("<think>r</think>ok", prefix="")
    assert msg == {"role": "assistant", "thinking": "r", "content": "ok"}
    with pytest.raises(AttributeError):
        PreTrainedTokenizer(engine).parse_response("x", prefix="")
