"""PaliGemma processor (reference models/paligemma/processing_paligemma.py):
prompts without ``<image>`` get ``<image>*seq_len*num_images + BOS + prompt +
"\\n"``; prompts carrying ``<image>`` get each token expanded to seq_len
copies with BOS inserted after the last image token. ``suffix`` (training
target) is appended with EOS and marked via token_type_ids."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin

IMAGE_TOKEN = "<image>"


class PaliGemmaProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_length: int | None = None, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        if image_seq_length is None:
            image_seq_length = getattr(image_processor, "image_seq_length", 256)
        self.image_seq_length = image_seq_length
        self.image_token = IMAGE_TOKEN

    def __call__(self, text=None, images=None, suffix=None,
                 return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        if images is None:
            raise ValueError("`images` are expected for PaliGemmaProcessor.")
        if text is None:
            text = ""
        if isinstance(text, str):
            text = [text]
        if not isinstance(images, (list, tuple)):
            images = [[images]]
        elif not isinstance(images[0], (list, tuple)):
            images = [[im] for im in images]
        bos = getattr(self.tokenizer, "bos_token", "") or ""
        if not any(IMAGE_TOKEN in t for t in text):
            input_strings = [
                f"{IMAGE_TOKEN * self.image_seq_length * len(group)}{bos}{prompt}\n"
                for prompt, group in zip(text, images)]
        else:
            input_strings = []
            for sample in text:
                s = sample.replace(IMAGE_TOKEN, IMAGE_TOKEN * self.image_seq_length)
                r = s.rfind(IMAGE_TOKEN)
                at = r + len(IMAGE_TOKEN) if r != -1 else 0
                input_strings.append(f"{s[:at]}{bos}{s[at:]}\n")
        flat = [im for group in images for im in group]
        data = dict(self.image_processor(flat, return_tensors=return_tensors))
        if suffix is not None:
            if isinstance(suffix, str):
                suffix = [suffix]
            eos = getattr(self.tokenizer, "eos_token", "") or ""
            input_strings = [p + s + eos for p, s in zip(input_strings, suffix)]
        data.update(self.tokenizer(
            input_strings, return_tensors=return_tensors, padding=padding,
            add_special_tokens=False,
            **{k: v for k, v in kwargs.items()
               if k in ("truncation", "max_length")}))
        return BatchFeature(data)
