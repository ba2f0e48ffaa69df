"""TAPAS table encoding (reference models/tapas/tokenization_tapas.py):
flatten ``question [SEP] cell cell ...`` with the 7-channel token_type_ids
the TAPAS embedder consumes — [segment, column(1-based), row(1-based, 0 for
the header row), prev_labels, column_ranks, inv_column_ranks,
numeric_relations]. Ranks are filled for numeric columns; the wrapped
tokenizer supplies the subword vocabulary."""

from __future__ import annotations

import numpy as np


class TapasTableEncoder:
    """Wraps any of our tokenizers with TAPAS table flattening."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def _rank_column(self, values):
        try:
            nums = [float(str(v).replace(",", "")) for v in values]
        except ValueError:
            return [0] * len(values), [0] * len(values)
        order = np.argsort(np.argsort(nums)) + 1
        inv = len(values) + 1 - order
        return order.tolist(), inv.tolist()

    def encode(self, table: dict, queries, max_length: int = 512):
        """table: {column_name: [cell, ...]}; queries: str | list[str].
        Returns np arrays (input_ids, attention_mask, token_type_ids[B,S,7])
        plus the per-token (row, col) map for postprocessing."""
        if isinstance(queries, str):
            queries = [queries]
        tok = self.tokenizer
        cols = list(table.keys())
        n_rows = len(next(iter(table.values()))) if cols else 0
        ranks = {c: self._rank_column(table[c]) for c in cols}

        encs = []
        for q in queries:
            ids = list(tok.encode(q, add_special_tokens=False))
            types = [[0, 0, 0, 0, 0, 0, 0]] * len(ids)
            cls_id = getattr(tok, "cls_token_id", None) or getattr(tok, "bos_token_id", 0)
            sep_id = getattr(tok, "sep_token_id", None) or getattr(tok, "eos_token_id", 0)
            ids = [cls_id] + ids + [sep_id]
            types = [[0] * 7] + types + [[0] * 7]
            # header row: row id 0
            for ci, c in enumerate(cols, start=1):
                wids = tok.encode(str(c), add_special_tokens=False)
                ids.extend(wids)
                types.extend([[1, ci, 0, 0, 0, 0, 0]] * len(wids))
            for ri in range(n_rows):
                for ci, c in enumerate(cols, start=1):
                    wids = tok.encode(str(table[c][ri]), add_special_tokens=False)
                    rank, inv = ranks[c]
                    ids.extend(wids)
                    types.extend([[1, ci, ri + 1, 0, rank[ri], inv[ri], 0]]
                                 * len(wids))
            encs.append((ids[:max_length], types[:max_length]))
        s = max(len(e[0]) for e in encs)
        pad = getattr(tok, "pad_token_id", 0) or 0
        b = len(encs)
        input_ids = np.full((b, s), pad, np.int64)
        mask = np.zeros((b, s), np.int64)
        tt = np.zeros((b, s, 7), np.int64)
        for i, (ids, types) in enumerate(encs):
            input_ids[i, :len(ids)] = ids
            mask[i, :len(ids)] = 1
            tt[i, :len(types)] = types
        return {"input_ids": input_ids, "attention_mask": mask,
                "token_type_ids": tt}

    def cells_for_tokens(self, token_type_ids):
        """[S, 7] -> list of (row, col) per token (0 = not a cell)."""
        return [(int(t[2]), int(t[1])) for t in token_type_ids]
