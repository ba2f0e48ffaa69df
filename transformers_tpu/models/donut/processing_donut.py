"""Donut processor (reference models/donut/processing_donut.py): Donut image
processor + XLM-R tokenizer, plus ``token2json`` — the inverse of Donut's
XML-ish ``<s_key>value</s_key>`` serialization used by the DocVQA/CORD
checkpoints."""

from __future__ import annotations

import re

from ...processing_utils import ProcessorMixin


class DonutProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __call__(self, images=None, text=None, **kwargs):
        out = super().__call__(text=text, images=images, **kwargs)
        if text is not None and images is not None:
            out["labels"] = out["input_ids"]
        return out

    def token2json(self, tokens: str, is_inner_value: bool = False,
                   added_vocab=None):
        """Parse ``<s_k>...</s_k>`` sequences into (nested) dicts; sibling
        groups separated by ``<sep/>`` become lists, categorical special
        tokens ``<x/>`` in the added vocab are unwrapped to ``x``."""
        if added_vocab is None:
            added_vocab = self.tokenizer.get_added_vocab()

        result: dict = {}
        rest = tokens
        while rest:
            m = re.search(r"<s_", rest, re.IGNORECASE)
            if m is None or ">" not in rest[m.start():]:
                break
            open_tag = rest[m.start():]
            open_tag = open_tag[: open_tag.index(">") + 1]
            key = open_tag[len("<s_"):-1]
            close = re.search(rf"</s_{re.escape(key)}>", rest, re.IGNORECASE)
            if close is None:
                rest = rest.replace(open_tag, "")
                continue
            inner = re.search(
                re.escape(open_tag) + "(.*?)" + re.escape(close.group()),
                rest, re.IGNORECASE | re.DOTALL)
            if inner is not None:
                body = inner.group(1).strip()
                if "<s_" in body and "</s_" in body:
                    child = self.token2json(body, is_inner_value=True,
                                            added_vocab=added_vocab)
                    if child:
                        result[key] = child[0] if len(child) == 1 else child
                else:
                    vals = []
                    for leaf in body.split("<sep/>"):
                        leaf = leaf.strip()
                        if (leaf in added_vocab and leaf.startswith("<")
                                and leaf.endswith("/>")):
                            leaf = leaf[1:-2]
                        vals.append(leaf)
                    result[key] = vals[0] if len(vals) == 1 else vals
            rest = rest[rest.find(close.group()) + len(close.group()):].strip()
            if rest.startswith("<sep/>"):
                return [result] + self.token2json(rest[len("<sep/>"):],
                                                  is_inner_value=True,
                                                  added_vocab=added_vocab)
        if result:
            return [result] if is_inner_value else result
        return [] if is_inner_value else {"text_sequence": rest}
