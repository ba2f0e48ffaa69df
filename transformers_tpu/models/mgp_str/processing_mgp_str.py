"""MGP-STR processor (reference models/mgp_str/processing_mgp_str.py): ViT
image processor + char tokenizer, with three-head scene-text decoding — the
char/BPE/wordpiece logit stacks are greedy-decoded to their EOS and the head
with the highest cumulative confidence wins per sample.

The reference downloads GPT-2 / BERT tokenizers from the hub for the bpe/wp
heads; here they are optional constructor arguments (``bpe_tokenizer``,
``wp_tokenizer``) — absent heads score 0 and never win."""

from __future__ import annotations

import numpy as np

from ...processing_utils import ProcessorMixin

_EOS = {"char": (1, "[s]"), "bpe": (2, "#"), "wp": (102, "[SEP]")}


class MgpstrProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None, bpe_tokenizer=None,
                 wp_tokenizer=None, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.char_tokenizer = tokenizer
        self.bpe_tokenizer = bpe_tokenizer
        self.wp_tokenizer = wp_tokenizer

    def __call__(self, text=None, images=None, **kwargs):
        out = super().__call__(text=text, images=images, **kwargs)
        if text is not None and images is not None:
            out["labels"] = out.pop("input_ids")
            out.pop("attention_mask", None)
        return out

    def char_decode(self, sequences):
        return ["".join(self.char_tokenizer.convert_ids_to_tokens(s)).replace(" ", "")
                for s in np.asarray(sequences)]

    def bpe_decode(self, sequences):
        return self.bpe_tokenizer.batch_decode(np.asarray(sequences))

    def wp_decode(self, sequences):
        return ["".join(self.wp_tokenizer.convert_ids_to_tokens(s)).replace(" ", "")
                for s in np.asarray(sequences)]

    def _decode_helper(self, logits, fmt):
        decoder = {"char": self.char_decode, "bpe": self.bpe_decode,
                   "wp": self.wp_decode}[fmt]
        tok = {"char": self.char_tokenizer, "bpe": self.bpe_tokenizer,
               "wp": self.wp_tokenizer}[fmt]
        eos_token, eos_str = _EOS[fmt]
        logits = np.asarray(logits, np.float32)
        if tok is None:
            return [""] * logits.shape[0], [0.0] * logits.shape[0]
        # greedy ids, position 0 is the BOS slot (dropped)
        ids = logits.argmax(-1)[:, 1:]
        x = logits - logits.max(-1, keepdims=True)
        probs = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
        maxp = probs.max(-1)[:, 1:]
        strs = decoder(ids)
        out_strs, scores = [], []
        for i in range(ids.shape[0]):
            cut = strs[i].find(eos_str)
            out_strs.append(strs[i][:cut] if cut >= 0 else strs[i])
            row = ids[i].tolist()
            eos_at = row.index(eos_token) if eos_token in row else -1
            conf = maxp[i][: eos_at + 1]
            scores.append(float(np.prod(conf)) if conf.size else 0.0)
        return out_strs, scores

    def batch_decode(self, sequences):
        char_logits, bpe_logits, wp_logits = sequences
        char_strs, char_sc = self._decode_helper(char_logits, "char")
        bpe_strs, bpe_sc = self._decode_helper(bpe_logits, "bpe")
        wp_strs, wp_sc = self._decode_helper(wp_logits, "wp")
        final, final_sc = [], []
        for c, b, w, sc, sb, sw in zip(char_strs, bpe_strs, wp_strs,
                                       char_sc, bpe_sc, wp_sc):
            scores = [sc, sb, sw]
            strs = [c, b, w]
            best = scores.index(max(scores))
            final.append(strs[best])
            final_sc.append(scores[best])
        return {"generated_text": final, "scores": final_sc,
                "char_preds": char_strs, "bpe_preds": bpe_strs,
                "wp_preds": wp_strs}
