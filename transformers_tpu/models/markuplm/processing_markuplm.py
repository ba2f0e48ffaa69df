"""MarkupLM processor (reference models/markuplm/processing_markuplm.py):
HTML -> (nodes, xpaths) via the feature extractor, then tokenization where
every subword inherits its node's xpath encoded as tag-id and subscript
sequences padded to max_depth."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .feature_extraction_markuplm import MarkupLMFeatureExtractor


class MarkupLMProcessor(ProcessorMixin):
    attributes = ["feature_extractor", "tokenizer"]

    def __init__(self, feature_extractor=None, tokenizer=None, tags_dict=None,
                 max_depth: int = 50, max_width: int = 1000,
                 pad_tag_id: int = 216, pad_width: int = 1001, **kwargs):
        super().__init__(feature_extractor=feature_extractor or MarkupLMFeatureExtractor(),
                         tokenizer=tokenizer, **kwargs)
        self.tags_dict = tags_dict or {}
        self.max_depth = max_depth
        self.max_width = max_width
        self.pad_tag_id = pad_tag_id
        self.pad_width = pad_width
        self.unk_tag_id = len(self.tags_dict)

    def xpath_to_ids(self, xpath: str):
        tags = [self.pad_tag_id] * self.max_depth
        subs = [self.pad_width] * self.max_depth
        units = [u for u in xpath.split("/") if u]
        for i, unit in enumerate(units[: self.max_depth]):
            name, _, rest = unit.partition("[")
            tags[i] = self.tags_dict.get(name, self.unk_tag_id)
            # reference get_xpath_seq: the bracket number as-is, 0 if absent
            subs[i] = min(int(rest[:-1]) if rest else 0, self.max_width)
        return tags, subs

    def __call__(self, html_strings=None, nodes=None, xpaths=None, text=None,
                 return_tensors="np", padding=True, max_length=None,
                 **kwargs) -> BatchFeature:
        if html_strings is not None:
            ext = self.feature_extractor(html_strings)
            nodes, xpaths = ext["nodes"], ext["xpaths"]
        if nodes is None:
            raise ValueError("Pass html_strings or (nodes, xpaths).")
        if nodes and isinstance(nodes[0], str):
            nodes, xpaths = [nodes], [xpaths]
        tok = self.tokenizer
        encs = []
        for node_list, xpath_list in zip(nodes, xpaths):
            ids, tags, subs = [], [], []
            for node, xp in zip(node_list, xpath_list):
                wids = tok.encode(node, add_special_tokens=False)
                t, s = self.xpath_to_ids(xp)
                ids.extend(wids)
                tags.extend([t] * len(wids))
                subs.extend([s] * len(wids))
            cls_id = getattr(tok, "cls_token_id", None) or getattr(tok, "bos_token_id", None)
            sep_id = getattr(tok, "sep_token_id", None) or getattr(tok, "eos_token_id", None)
            pad_xpath = ([self.pad_tag_id] * self.max_depth,
                         [self.pad_width] * self.max_depth)
            if cls_id is not None:
                ids = [cls_id] + ids
                tags = [pad_xpath[0]] + tags
                subs = [pad_xpath[1]] + subs
            if sep_id is not None:
                ids = ids + [sep_id]
                tags = tags + [pad_xpath[0]]
                subs = subs + [pad_xpath[1]]
            if max_length:
                ids, tags, subs = ids[:max_length], tags[:max_length], subs[:max_length]
            encs.append((ids, tags, subs))
        target = max(len(e[0]) for e in encs)
        pad_id = getattr(tok, "pad_token_id", 0) or 0
        n = len(encs)
        input_ids = np.full((n, target), pad_id, np.int64)
        mask = np.zeros((n, target), np.int64)
        tag_seq = np.full((n, target, self.max_depth), self.pad_tag_id, np.int64)
        sub_seq = np.full((n, target, self.max_depth), self.pad_width, np.int64)
        for i, (ids, tags, subs) in enumerate(encs):
            input_ids[i, :len(ids)] = ids
            mask[i, :len(ids)] = 1
            tag_seq[i, :len(tags)] = tags
            sub_seq[i, :len(subs)] = subs
        data = {"input_ids": input_ids, "attention_mask": mask,
                "xpath_tags_seq": tag_seq, "xpath_subs_seq": sub_seq}
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
