"""MarkupLM feature extractor (reference
models/markuplm/feature_extraction_markuplm.py): parse an HTML string into
text nodes with their xpaths (tag path + sibling subscripts) using the
stdlib html.parser instead of bs4."""

from __future__ import annotations

from html.parser import HTMLParser

from ...image_processing_utils import BatchFeature

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
         "meta", "param", "source", "track", "wbr"}


class _Elem:
    __slots__ = ("tag", "parent", "tag_counts", "index")

    def __init__(self, tag, parent):
        self.tag = tag
        self.parent = parent
        self.tag_counts: dict[str, int] = {}  # same-tag child totals
        if parent is not None:
            parent.tag_counts[tag] = parent.tag_counts.get(tag, 0) + 1
            self.index = parent.tag_counts[tag]  # 1-based among same tag
        else:
            self.index = 1


class _Walker(HTMLParser):
    def __init__(self):
        super().__init__()
        self.root = _Elem("", None)
        self.cur = self.root
        # (text, element-at-emit) — subscripts resolve AFTER the full parse
        # so sibling totals are known (reference bs4 xpath_soup sees the
        # complete tree)
        self.hits: list[tuple[str, list[_Elem]]] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            return
        self.cur = _Elem(tag, self.cur)

    def handle_endtag(self, tag):
        if self.cur is not self.root and self.cur.tag == tag:
            self.cur = self.cur.parent

    def handle_data(self, data):
        text = data.strip()
        if not text or self.cur is self.root:
            return
        chain = []
        e = self.cur
        while e is not self.root:
            if e.tag in ("script", "style"):
                return
            chain.append(e)
            e = e.parent
        self.hits.append((text, list(reversed(chain))))


def _xpath(chain) -> str:
    # subscript shown only when the element has same-tag siblings
    # (reference xpath_soup: 0 when the parent has exactly one such child)
    out = []
    for e in chain:
        total = e.parent.tag_counts.get(e.tag, 1) if e.parent else 1
        out.append(f"{e.tag}[{e.index}]" if total > 1 else e.tag)
    return "/" + "/".join(out)


class MarkupLMFeatureExtractor:
    def __call__(self, html_strings) -> BatchFeature:
        if isinstance(html_strings, str):
            html_strings = [html_strings]
        all_nodes, all_xpaths = [], []
        for html in html_strings:
            w = _Walker()
            w.feed(html)
            all_nodes.append([t for t, _ in w.hits])
            all_xpaths.append([_xpath(c) for _, c in w.hits])
        return BatchFeature({"nodes": all_nodes, "xpaths": all_xpaths})
