"""Streaming chat-response parsing: structured message extraction from raw
model output.

Chat models emit flat text carrying structure — reasoning spans wrapped in
``<think>`` tags, tool calls as inline JSON, etc. A ``response_template``
(shipped in ``tokenizer_config.json``) declares that structure declaratively:
named *fields*, each bounded by open/close delimiters (literals or regexes),
with a content parser (text/json/...) and an optional restructuring
``transform``. This module interprets such templates, both one-shot
(:func:`parse_response`) and as a streaming event parser
(:class:`ResponseParser`) suitable for SSE serving.

Behavioral parity target: reference ``src/transformers/utils/chat_parsing/``
(response_parser.py, response_templates.py, content_parsers.py). The template
dict format and event shapes match the reference so hub-shipped templates work
unchanged; the engine here is our own single-pass commit-horizon design.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from inspect import isfunction, ismethod
from typing import Any, Callable, Optional

import regex  # partial-match support; standard `re` cannot stream delimiters

from .chat_template_utils import get_json_schema
from . import logging

logger = logging.get_logger(__name__)

__all__ = ["ResponseParser", "ResponseSchema", "parse_response"]


# --------------------------------------------------------------------------
# content parsers: region body -> python value
# --------------------------------------------------------------------------

def _strip(text: str, args: dict) -> str:
    return text.strip() if args.get("strip", True) else text


_JSON_SENTINELS = ("\x01", "\x02")


def _parse_json(text: str, args: dict) -> Any:
    """JSON with dialect accommodations for LLM output quirks.

    ``unquoted_keys`` quotes bare identifiers used as keys; ``string_delims``
    (list of [open, close] pairs) pre-extracts custom-delimited strings and
    re-injects them as proper JSON strings; ``allow_non_json`` degrades to the
    raw text instead of raising.
    """
    delims = args.get("string_delims", [])
    if delims and any(s in text for s in _JSON_SENTINELS):
        raise ValueError("json: input contains reserved sentinel bytes \\x01/\\x02")
    stage = text
    stash: list[str] = []
    for opener, closer in delims:
        pat = regex.escape(opener) + r"(.*?)" + regex.escape(closer)

        def grab(m, _stash=stash):
            _stash.append(m.group(1))
            return _JSON_SENTINELS[0] + str(len(_stash) - 1) + _JSON_SENTINELS[1]

        stage = regex.sub(pat, grab, stage, flags=regex.DOTALL)
    if args.get("unquoted_keys"):
        stage = regex.sub(r"(?<=[{,])\s*(\w+)\s*:", r'"\1":', stage)
    for i, s in enumerate(stash):
        stage = stage.replace(_JSON_SENTINELS[0] + str(i) + _JSON_SENTINELS[1], json.dumps(s))
    try:
        return json.loads(stage)
    except json.JSONDecodeError as e:
        if args.get("allow_non_json"):
            return _strip(text, args)
        raise ValueError(f"json parser failed on region {text!r}: {e}") from e


def _nested(raw: str, sub: Optional[dict]) -> Any:
    if sub is None:
        return raw
    return _CONTENT[sub.get("name", "text")](raw, sub.get("args", {}))


def _parse_xml_inline(text: str, args: dict) -> dict:
    """Shallow tag soup -> dict via a ``tag_pattern`` regex with named groups
    ``key``/``value``. ``merge_duplicates`` collects repeats into lists."""
    pat = args.get("tag_pattern")
    if pat is None:
        raise ValueError("xml-inline requires a 'tag_pattern' content_arg")
    out: dict[str, Any] = {}
    for m in regex.finditer(pat, text, flags=regex.DOTALL):
        gd = m.groupdict()
        if "key" not in gd or gd["key"] is None:
            raise ValueError(f"xml-inline tag_pattern needs a named group 'key': {pat}")
        val = _nested(gd.get("value", ""), args.get("value_parser"))
        key = gd["key"]
        if key in out and args.get("merge_duplicates"):
            if not isinstance(out[key], list):
                out[key] = [out[key]]
            out[key].append(val)
        else:
            out[key] = val
    return out


def _parse_kv_lines(text: str, args: dict) -> dict:
    out: dict[str, Any] = {}
    for line in text.split(args.get("line_sep", "\n")):
        line = _strip(line, args)
        sep = args.get("kv_sep", ":")
        if not line or sep not in line:
            continue
        k, v = (x.strip() for x in line.split(sep, 1))
        out[k] = _nested(v, args.get("value_parser"))
    return out


_CONTENT: dict[str, Callable[[str, dict], Any]] = {
    "text": _strip,
    "int": lambda t, a: int(_strip(t, a)),
    "float": lambda t, a: float(_strip(t, a)),
    "bool": lambda t, a: _strip(t, a).lower() in ("true", "1"),
    "json": _parse_json,
    "xml-inline": _parse_xml_inline,
    "kv-lines": _parse_kv_lines,
}
# These produce the body verbatim (mod whitespace), so their chunks stream
# clean; structured parsers only yield a value at close (chunks are "dirty").
_STREAMABLE = frozenset({"text", "int", "float", "bool"})


# --------------------------------------------------------------------------
# transforms: restructure parsed content using {placeholder} templates
# --------------------------------------------------------------------------

_PLACEHOLDER = regex.compile(r"\{(\w+)\}")


def _check_transform(where: str, node: Any) -> None:
    if isinstance(node, dict):
        for v in node.values():
            _check_transform(where, v)
    elif isinstance(node, list):
        for v in node:
            _check_transform(where, v)
    elif isinstance(node, str):
        if _PLACEHOLDER.search(node) and not _PLACEHOLDER.fullmatch(node):
            raise ValueError(
                f"{where}: transform string {node!r} mixes a placeholder with literal "
                "text; use a whole-string placeholder or a plain literal")


def _run_transform(node: Any, scope: dict) -> Any:
    if isinstance(node, dict):
        return {k: _run_transform(v, scope) for k, v in node.items()}
    if isinstance(node, list):
        return [_run_transform(v, scope) for v in node]
    if isinstance(node, str) and (m := _PLACEHOLDER.fullmatch(node)):
        if m.group(1) not in scope:
            raise KeyError(f"transform placeholder {node} undefined; have {sorted(scope)}")
        return scope[m.group(1)]
    return node


# --------------------------------------------------------------------------
# schema compilation
# --------------------------------------------------------------------------

@dataclass
class _Anchor:
    """A compiled open/close delimiter. Literal anchors remember their source
    strings so the streamer can commit a full literal at the buffer edge
    immediately (unless another literal in the set extends it)."""

    pattern: Any  # compiled regex, DOTALL
    literals: Optional[list[str]]
    extendable: bool  # some literal is a strict prefix of another

    @classmethod
    def compile(cls, where: str, spec: dict, lit_key: str, pat_key: str) -> Optional["_Anchor"]:
        if lit_key in spec and pat_key in spec:
            raise ValueError(f"{where}: give '{lit_key}' or '{pat_key}', not both")
        if lit_key in spec:
            raw = spec[lit_key]
            lits = [raw] if isinstance(raw, str) else list(dict.fromkeys(raw or []))
            if not lits or any(not isinstance(s, str) or not s for s in lits):
                raise ValueError(f"{where}: '{lit_key}' must be non-empty string(s)")
            alternation = "|".join(regex.escape(s) for s in sorted(lits, key=len, reverse=True))
            ext = any(a is not b and b.startswith(a) and a != b for a in lits for b in lits)
            return cls(regex.compile(alternation, regex.DOTALL), lits, ext)
        if pat_key in spec:
            try:
                return cls(regex.compile(spec[pat_key], regex.DOTALL), None, False)
            except regex.error as e:
                raise ValueError(f"{where}: bad {pat_key}: {e}") from e
        return None


@dataclass
class _Field:
    name: str
    opener: Optional[_Anchor]
    closer: Optional[_Anchor]
    content: str
    content_args: dict
    repeats: bool = False
    optional: bool = True
    transform: Any = None
    transform_each: bool = False


_FIELD_KEYS = {"open", "open_pattern", "close", "close_pattern", "content",
               "content_args", "repeats", "optional", "transform", "transform_each"}


@dataclass
class ResponseSchema:
    """Compiled response_template. ``implicit`` names the field with no open
    anchor (the sink that collects text outside any explicit region)."""

    defaults: dict
    fields: dict[str, _Field]
    start_anchor: _Anchor
    implicit: Optional[str] = None

    @classmethod
    def compile(cls, spec: "dict | ResponseSchema") -> "ResponseSchema":
        if isinstance(spec, ResponseSchema):
            return spec
        if not isinstance(spec, dict):
            raise ValueError(f"response_template must be a dict, got {type(spec).__name__}")
        if spec.get("version", 1) != 1:
            raise ValueError(f"unsupported response_template version {spec.get('version')}")
        extra = set(spec) - {"version", "defaults", "fields", "start_anchor", "start_anchor_pattern"}
        if extra:
            raise ValueError(f"unknown response_template keys: {sorted(extra)}")
        raw_fields = spec.get("fields")
        if not isinstance(raw_fields, dict) or not raw_fields:
            raise ValueError("response_template.fields must be a non-empty dict")
        fields: dict[str, _Field] = {}
        for name, fs in raw_fields.items():
            where = f"field '{name}'"
            if not isinstance(fs, dict):
                raise ValueError(f"{where} must be a dict")
            if unknown := set(fs) - _FIELD_KEYS:
                raise ValueError(f"{where}: unknown keys {sorted(unknown)}")
            content = fs.get("content", "text")
            if content not in _CONTENT:
                raise ValueError(f"{where}: unknown content parser {content!r}")
            opener = _Anchor.compile(where, fs, "open", "open_pattern")
            closer = _Anchor.compile(where, fs, "close", "close_pattern")
            transform = fs.get("transform")
            if transform is not None:
                _check_transform(where, transform)
            else:
                named = set()
                for a in (opener, closer):
                    if a is not None:
                        named |= set(a.pattern.groupindex)
                if named:
                    raise ValueError(
                        f"{where}: named capture group(s) {sorted(named)} need a "
                        "'transform' to surface them")
            if fs.get("transform_each") and transform is None:
                raise ValueError(f"{where}: transform_each without transform")
            fields[name] = _Field(
                name=name, opener=opener, closer=closer, content=content,
                content_args=fs.get("content_args", {}),
                repeats=bool(fs.get("repeats", False)),
                optional=bool(fs.get("optional", True)),
                transform=transform,
                transform_each=bool(fs.get("transform_each", False)))
        implicit = [n for n, f in fields.items() if f.opener is None]
        if len(implicit) > 1:
            raise ValueError(f"only one field may omit 'open' (the implicit sink); got {implicit}")
        start = _Anchor.compile("response_template", spec, "start_anchor", "start_anchor_pattern")
        if start is None:
            raise ValueError("response_template needs 'start_anchor' or 'start_anchor_pattern'")
        return cls(defaults=dict(spec.get("defaults", {})), fields=fields,
                   start_anchor=start, implicit=implicit[0] if implicit else None)

    def strip_prompt(self, prefix: str) -> str:
        """Drop everything through the LAST start-anchor match — the template
        prefill up to the head of the current assistant message."""
        end = None
        for m in self.start_anchor.pattern.finditer(prefix):
            end = m.end()
        if end is None:
            logger.info("response_template start anchor absent from prefix; parsing it whole")
            return prefix
        return prefix[end:]


# --------------------------------------------------------------------------
# tool-argument coercion (string args -> schema-typed values)
# --------------------------------------------------------------------------

def _schema_types(schema: Any) -> tuple[str, ...]:
    if not isinstance(schema, dict):
        return ()
    t = schema.get("type")
    out = [t] if isinstance(t, str) else [x for x in (t or []) if isinstance(x, str)]
    for alt in schema.get("anyOf") or []:
        out.extend(_schema_types(alt))
    if schema.get("nullable") and "null" not in out:
        out.append("null")
    return tuple(out)


def _coerce_scalar(raw: str, types: tuple[str, ...]) -> Any:
    for t in types:
        try:
            if t == "integer":
                return int(raw)
            if t == "number":
                x = float(raw)
                if x != x or x in (float("inf"), float("-inf")):
                    continue
                return int(x) if x.is_integer() and "." not in raw else x
            if t == "boolean" and raw.strip().lower() in ("true", "false", "0", "1"):
                return raw.strip().lower() in ("true", "1")
            if t == "null" and raw.strip() in ("null", "None"):
                return None
            if t in ("object", "array"):
                v = json.loads(raw)
                if isinstance(v, dict if t == "object" else list):
                    return v
        except ValueError:
            continue
    return raw


def _tool_properties(tools) -> dict[str, dict]:
    props: dict[str, dict] = {}
    for tool in tools or []:
        if isfunction(tool) or ismethod(tool):
            tool = get_json_schema(tool)
        fn = tool.get("function", tool) if isinstance(tool, dict) else None
        if isinstance(fn, dict) and isinstance(fn.get("name"), str):
            params = fn.get("parameters")
            p = params.get("properties") if isinstance(params, dict) else None
            props[fn["name"]] = p if isinstance(p, dict) else {}
    return props


# --------------------------------------------------------------------------
# the streaming parser
# --------------------------------------------------------------------------

@dataclass
class _Pending:
    """Scan outcome: the earliest committable delimiter hit (if any) plus the
    leftmost buffer index still claimed by an unresolved (partial or growable)
    delimiter. Text before ``horizon`` is safe to stream out."""

    hit: Optional[tuple[str, _Field, Any]]
    horizon: int


class ResponseParser:
    """Incremental interpreter for a compiled :class:`ResponseSchema`.

    ``feed(chunk)`` returns a list of events (``region_open`` /
    ``region_chunk`` / ``region_close``); ``finalize()`` returns
    ``(message_dict, trailing_events)``. ``prefix`` — the rendered chat prompt
    — is required because templates often pre-open a region (e.g. a
    ``<think>`` tag in the prefill); events replayed from the prefix are on
    ``initial_events``.
    """

    def __init__(self, template: "dict | ResponseSchema", prefix: Optional[str] = None,
                 *, tools=None):
        self.schema = ResponseSchema.compile(template)
        if prefix is None:
            raise ValueError(
                "ResponseParser needs prefix= (the chat prompt before generation); "
                "pass prefix='' explicitly if the text already holds the whole message")
        self._tools = _tool_properties(tools)
        self._buf = ""
        self._pos = 0
        self._message: dict[str, Any] = dict(self.schema.defaults)
        self._region: Optional[str] = self.schema.implicit
        self._region_live = False  # has the current region emitted region_open?
        self._body = ""
        self._caps: dict[str, str] = {}
        self._done = False
        self.initial_events: list[dict] = []
        if prefix:
            tail = self.schema.strip_prompt(prefix)
            if tail:
                self._buf = tail
                self._drain(self.initial_events, eos=False)

    # -- public API --------------------------------------------------------

    def feed(self, chunk: str) -> list[dict]:
        if self._done:
            raise RuntimeError("parser already finalized")
        if chunk:
            self._buf += chunk
        events: list[dict] = []
        self._drain(events, eos=False)
        return events

    def finalize(self) -> tuple[dict, list[dict]]:
        if self._done:
            raise RuntimeError("parser already finalized")
        events: list[dict] = []
        self._drain(events, eos=True)
        required = [n for n, f in self.schema.fields.items()
                    if not f.optional and n not in self._message]
        if required:
            raise ValueError(f"required response fields never parsed: {required}")
        keep = self.schema.defaults

        def empty(v):
            return v is None or (isinstance(v, (str, list, dict)) and not v)

        self._message = {k: v for k, v in self._message.items()
                         if k in keep or not empty(v)}
        self._done = True
        return self._message, events

    # -- engine ------------------------------------------------------------

    def _watched(self) -> list[tuple[str, _Field, _Anchor]]:
        """Delimiters that can fire next. Inside an explicit region only its
        own close matters; in the implicit/null region, every explicit open
        plus the implicit close."""
        sch = self.schema
        if self._region is not None and self._region != sch.implicit:
            f = sch.fields[self._region]
            return [("close", f, f.closer)] if f.closer is not None else []
        watch = [("open", f, f.opener) for f in sch.fields.values() if f.opener is not None]
        if sch.implicit is not None and (impl := sch.fields[sch.implicit]).closer is not None:
            watch.append(("close", impl, impl.closer))
        return watch

    def _growable(self, kind: str, f: _Field, m) -> bool:
        """Could this complete match still lengthen with more input? Only at
        the buffer edge: zero-width matches are real only at EOS; a finished
        literal is final unless a sibling literal extends it; regex anchors
        always might grow."""
        if m.end() != len(self._buf):
            return False
        if m.start() == m.end():
            return True
        a = f.opener if kind == "open" else f.closer
        return a.literals is None or a.extendable

    def _scan(self, eos: bool) -> _Pending:
        best = None
        best_rank = None
        horizon = len(self._buf)
        for kind, f, anchor in self._watched():
            m = (anchor.pattern.search(self._buf, self._pos) if eos
                 else anchor.pattern.search(self._buf, self._pos, partial=True))
            if m is None:
                continue
            if not eos and (m.partial or self._growable(kind, f, m)):
                horizon = min(horizon, m.start())
                continue
            rank = (m.start(), m.start() - m.end(), kind != "open", f.name)
            if best_rank is None or rank < best_rank:
                best, best_rank = (kind, f, m), rank
        if best is not None and best[2].start() >= horizon:
            best = None  # an unresolved delimiter starts no later; wait for it
        return _Pending(best, horizon)

    def _drain(self, events: list[dict], eos: bool) -> None:
        while True:
            p = self._scan(eos)
            if p.hit is not None:
                kind, f, m = p.hit
                if m.start() > self._pos:
                    self._emit(events, self._buf[self._pos:m.start()])
                self._pos = m.end()
                if kind == "open":
                    self._close(events)
                    self._region = f.name
                    self._caps = {k: v for k, v in m.groupdict().items() if v is not None}
                    self._body = ""
                    self._region_live = True
                    events.append({"type": "region_open", "field": f.name})
                else:
                    was_live = self._region_live
                    self._close(events)
                    if not was_live and m.start() == m.end():
                        break  # zero-width close of an empty region: no progress
                continue
            if eos:
                if self._pos < len(self._buf):
                    self._emit(events, self._buf[self._pos:])
                    self._pos = len(self._buf)
                self._close(events)
                return
            if p.horizon > self._pos:
                self._emit(events, self._buf[self._pos:p.horizon])
                self._pos = p.horizon
            return

    def _emit(self, events: list[dict], text: str) -> None:
        if not text or self._region is None:
            return
        f = self.schema.fields[self._region]
        if not self._region_live:
            events.append({"type": "region_open", "field": self._region})
            self._region_live = True
        self._body += text
        events.append({"type": "region_chunk", "field": self._region, "text": text,
                       "dirty": f.content not in _STREAMABLE})

    def _close(self, events: list[dict]) -> None:
        if self._region is not None and self._region_live:
            f = self.schema.fields[self._region]
            value = _CONTENT[f.content](self._body, f.content_args)
            if f.transform is not None:
                if f.transform_each:
                    if not isinstance(value, list):
                        raise ValueError(
                            f"field '{f.name}': transform_each needs list content, "
                            f"got {type(value).__name__}")
                    value = [_run_transform(f.transform, {**self._caps, **item})
                             for item in value]
                else:
                    value = _run_transform(f.transform, {**self._caps, "content": value})
            if self._tools:
                value = self._coerce_tools(value)
            if f.repeats:
                self._message.setdefault(f.name, []).append(value)
            else:
                self._message[f.name] = value
            events.append({"type": "region_close", "field": f.name, "value": value})
        self._region = self.schema.implicit
        self._region_live = False
        self._body = ""
        self._caps = {}

    def _coerce_tools(self, value: Any) -> Any:
        if isinstance(value, list):
            return [self._coerce_tools(v) for v in value]
        fn = value.get("function") if isinstance(value, dict) else None
        if not isinstance(fn, dict):
            return value
        name, arguments = fn.get("name"), fn.get("arguments")
        if isinstance(name, str) and isinstance(arguments, dict):
            props = self._tools.get(name) or {}
            for k, v in arguments.items():
                if k in props and (types := _schema_types(props[k])):
                    if isinstance(v, str):
                        arguments[k] = _coerce_scalar(v, types)
                    elif isinstance(v, list):
                        arguments[k] = [_coerce_scalar(x, types) if isinstance(x, str) else x
                                        for x in v]
        return value


def parse_response(text: str, template: "dict | ResponseSchema", *,
                   prefix: Optional[str] = None, tools=None) -> dict:
    """One-shot parse of a complete generation. See :class:`ResponseParser`
    for streaming. Reference: utils/chat_parsing/response_parser.py:66."""
    p = ResponseParser(template, prefix=prefix, tools=tools)
    p.feed(text)
    message, _ = p.finalize()
    return message
