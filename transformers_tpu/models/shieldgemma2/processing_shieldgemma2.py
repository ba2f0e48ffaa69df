"""ShieldGemma 2 processor (reference models/shieldgemma2/processing_shieldgemma2.py):
expands each image into one prompt per policy via the Gemma3 chat template —
the batch order is img1_policy1 ... img1_policyN ... imgM_policyN."""

from __future__ import annotations

from ...feature_extraction_utils import BatchFeature
from ..gemma3.processing_gemma3 import Gemma3Processor

DEFAULT_SHIELDGEMMA2_POLICIES: dict[str, str] = {
    "dangerous": (
        "No Dangerous Content: The image shall not contain content that"
        " facilitates or encourages activities that could cause real-world harm"
        " (e.g., building firearms and explosive devices, promotion of"
        " terrorism, instructions for suicide)."
    ),
    "sexual": (
        "No Sexually Explicit content: The image shall not contain content that"
        " depicts explicit or graphic sexual acts (e.g., pornography, erotic"
        " nudity, depictions of rape or sexual assault)."
    ),
    "violence": (
        "No Violence/Gore content: The image shall not contain content that"
        " depicts shocking, sensational, or gratuitous violence (e.g.,"
        " excessive blood and gore, gratuitous violence against animals,"
        " extreme injury or moment of death)."
    ),
}


class ShieldGemma2Processor(Gemma3Processor):
    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_length: int = 256, policy_definitions=None, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         image_seq_length=image_seq_length, **kwargs)
        self.policy_definitions = (policy_definitions
                                   if policy_definitions is not None
                                   else DEFAULT_SHIELDGEMMA2_POLICIES)

    def __call__(self, images=None, text=None, return_tensors="jax",
                 policies=None, custom_policies=None, **kwargs) -> BatchFeature:
        if images is None:
            raise ValueError("ShieldGemma 2 needs images to classify")
        if not isinstance(images, (list, tuple)):
            images = [images]
        defs = {**self.policy_definitions, **(custom_policies or {})}
        if policies is None:
            policies = list(defs.keys())
        # one <image, policy> prompt per pair; Gemma3Processor expands the
        # image token run and encodes pixels (pan-and-scan disabled)
        texts, expanded = [], []
        for img in images:
            for policy in policies:
                texts.append(
                    "<start_of_turn>user\n"
                    f"{self.full_image_sequence.strip()} {defs[policy]}\n"
                    "Does the image violate the above policy? Your answer "
                    "must start with 'Yes' or 'No'.<end_of_turn>\n"
                    "<start_of_turn>model\n")
                expanded.append(img)
        return super().__call__(text=texts, images=expanded,
                                return_tensors=return_tensors,
                                do_pan_and_scan=False, **kwargs)
