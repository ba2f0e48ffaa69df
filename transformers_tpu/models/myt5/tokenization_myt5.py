"""MyT5 tokenizer (reference models/myt5/tokenization_myt5.py).

Morphology-aware byte tokenizer: UTF-8 bytes as 2-char hex tokens, rewritten
by the ``byte_maps.json`` decompose then merge rule trees (longest-match
over a hash trie, :31-131); ids are byte value + the 3 sentinel offset.
"""

from __future__ import annotations

import json
import os


class ByteRewriter:
    LEAF = "[LEAF]"

    def __init__(self, rules: dict[str, str]):
        self.hash_tree = self._build(rules)
        self.reverse_hash_tree = self._build({v: k for k, v in rules.items()})

    def _build(self, rules):
        tree: dict = {}
        for b in (f"{x:02x}" for x in range(256)):
            tree[b] = {self.LEAF: [b]}
        for seq_in, seq_out in rules.items():
            ptr = tree
            for b in seq_in.split(" "):
                ptr = ptr.setdefault(b, {})
            ptr[self.LEAF] = seq_out.split(" ")
        return tree

    def rewrite_bytes(self, in_bytes: list[str], reverse=False) -> list[str]:
        out = []
        start = 0
        while start < len(in_bytes):
            ptr = self.reverse_hash_tree if reverse else self.hash_tree
            leaf = [in_bytes[start]]
            end = start
            for j in range(start, len(in_bytes)):
                b = in_bytes[j]
                if b in ptr:
                    ptr = ptr[b]
                elif j == start:
                    leaf = [b]
                    end = j
                    break
                else:
                    break
                if self.LEAF in ptr:
                    leaf = ptr[self.LEAF]
                    end = j
            out.extend(leaf)
            start = end + 1
        return out


class MyT5Tokenizer:
    """pad=0, eos=1, unk=2; byte ids offset by 3 (reference :163-208)."""

    offset = 3

    def __init__(self, vocab_file, eos_token="</s>", unk_token="<unk>",
                 pad_token="<pad>", **kwargs):
        with open(vocab_file, encoding="utf-8") as f:
            self.byte_maps = json.load(f)
        self.decompose_rewriter = ByteRewriter(self.byte_maps["decompose_map"])
        self.merge_rewriter = ByteRewriter(self.byte_maps["merge_map"])
        self.pad_token, self.eos_token, self.unk_token = pad_token, eos_token, unk_token
        self.pad_token_id, self.eos_token_id, self.unk_token_id = 0, 1, 2

    @property
    def vocab_size(self):
        return 256 + self.offset

    def tokenize(self, text: str) -> list[str]:
        tokens = [f"{b:02x}" for b in text.encode("utf-8")]
        tokens = self.decompose_rewriter.rewrite_bytes(tokens)
        return self.merge_rewriter.rewrite_bytes(tokens)

    def convert_tokens_to_ids(self, tokens):
        return [int(t, 16) + self.offset if len(t) == 2 else self.unk_token_id
                for t in tokens]

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if add_special_tokens:
            ids = ids + [self.eos_token_id]
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        tokens = [f"{int(i) - self.offset:02x}" for i in ids
                  if int(i) >= self.offset]
        tokens = self.merge_rewriter.rewrite_bytes(tokens, reverse=True)
        tokens = self.decompose_rewriter.rewrite_bytes(tokens, reverse=True)
        return bytes(int(t, 16) for t in tokens if len(t) == 2).decode(
            "utf-8", errors="ignore")

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        return cls(os.path.join(str(path), "byte_maps.json"), **kwargs)
