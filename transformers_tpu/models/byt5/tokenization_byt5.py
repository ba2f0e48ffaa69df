"""ByT5 tokenizer (reference src/transformers/models/byt5/tokenization_byt5.py).

Pure byte-level tokenizer: ids 0..2 are pad/eos/unk, ids 3..258 the raw
bytes, followed by ``extra_ids`` sentinel tokens. No vocab file."""

from __future__ import annotations


class ByT5Tokenizer:
    def __init__(self, eos_token="</s>", unk_token="<unk>", pad_token="<pad>",
                 extra_ids=125, **kwargs):
        self.pad_token, self.eos_token, self.unk_token = pad_token, eos_token, unk_token
        self.offset = 3
        self._extra_ids = extra_ids
        self.pad_token_id, self.eos_token_id, self.unk_token_id = 0, 1, 2

    @classmethod
    def from_pretrained(cls, path_or_repo, **kwargs):
        import json

        from ...utils.hub import cached_file

        cfg = {}
        cfg_file = cached_file(str(path_or_repo), "tokenizer_config.json",
                               _raise_exceptions_for_missing_entries=False)
        if cfg_file:
            with open(cfg_file, encoding="utf-8") as f:
                cfg = json.load(f)
        cfg.update(kwargs)
        known = {k: v for k, v in cfg.items()
                 if k in ("eos_token", "unk_token", "pad_token", "extra_ids")}
        return cls(**known)

    def save_pretrained(self, save_directory):
        import json
        import os

        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, "tokenizer_config.json"), "w") as f:
            json.dump({"tokenizer_class": "ByT5Tokenizer",
                       "extra_ids": self._extra_ids}, f)

    @property
    def vocab_size(self):
        return 256

    def __len__(self):
        return 256 + self.offset + self._extra_ids

    def encode(self, text, add_special_tokens=True):
        ids = [b + self.offset for b in text.encode("utf-8")]
        if add_special_tokens:
            ids.append(self.eos_token_id)
        return ids

    def __call__(self, text, add_special_tokens=True, **kwargs):
        if isinstance(text, str):
            return {"input_ids": self.encode(text, add_special_tokens)}
        ids = [self.encode(t, add_special_tokens) for t in text]
        return {"input_ids": ids}

    def convert_ids_to_tokens(self, ids):
        out = []
        specials = {0: self.pad_token, 1: self.eos_token, 2: self.unk_token}
        n_base = 256 + self.offset
        for i in ids:
            if i in specials:
                out.append(specials[i])
            elif i < n_base:
                out.append(chr(i - self.offset))
            else:
                out.append(f"<extra_id_{len(self) - 1 - i}>")
        return out

    def decode(self, ids, skip_special_tokens=True):
        bs = bytearray()
        for i in ids:
            if self.offset <= i < 256 + self.offset:
                bs.append(i - self.offset)
            elif not skip_special_tokens and i < self.offset:
                pass
        return bs.decode("utf-8", errors="ignore")
