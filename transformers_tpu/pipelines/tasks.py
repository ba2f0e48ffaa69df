"""Task pipelines (reference src/transformers/pipelines/*.py — the
load-bearing subset of the 24 registered tasks)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from .base import Pipeline, softmax_np


class TextGenerationPipeline(Pipeline):
    """reference pipelines/text_generation.py (chat-aware :507)."""

    def __call__(self, inputs, **kwargs):
        # a list of {"role", "content"} dicts is ONE chat, not a batch
        if (isinstance(inputs, list) and inputs and isinstance(inputs[0], dict)
                and "role" in inputs[0]):
            pre, fwd, post = self._sanitize_parameters(**kwargs)
            return self.run_single(inputs, pre, fwd, post)
        return super().__call__(inputs, **kwargs)

    def _sanitize_parameters(self, **kwargs):
        post = {k: kwargs.pop(k) for k in ("return_full_text",) if k in kwargs}
        return {}, kwargs, post

    def preprocess(self, inputs, **kwargs):
        if isinstance(inputs, list) and inputs and isinstance(inputs[0], dict):
            # chat messages
            ids = self.tokenizer.apply_chat_template(inputs, add_generation_prompt=True)
            return {"input_ids": np.asarray([ids]), "prompt_is_chat": True, "messages": inputs}
        ids = self.tokenizer.encode(inputs)
        return {"input_ids": np.asarray([ids]), "prompt_is_chat": False, "prompt_text": inputs}

    def _forward(self, model_inputs, **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 32)
        # bucket == prompt length so the generated tail starts at prompt_len
        generate_kwargs.setdefault("prompt_pad_multiple", 1)
        out = self.model.generate(self.model.params,
                                  input_ids=jnp.asarray(model_inputs["input_ids"]),
                                  **generate_kwargs)
        return {"sequences": np.asarray(out), "inputs": model_inputs}

    def postprocess(self, model_outputs, return_full_text: bool = True):
        seq = model_outputs["sequences"][0]
        inputs = model_outputs["inputs"]
        prompt_len = inputs["input_ids"].shape[1]
        gen_ids = seq[prompt_len:]
        text = self.tokenizer.decode([int(t) for t in gen_ids], skip_special_tokens=True)
        if inputs.get("prompt_is_chat"):
            return [{"generated_text": inputs["messages"] + [{"role": "assistant", "content": text}]}]
        prefix = inputs.get("prompt_text", "") if return_full_text else ""
        return [{"generated_text": prefix + text}]


class TextClassificationPipeline(Pipeline):
    """reference pipelines/text_classification.py."""

    def preprocess(self, inputs, **kwargs):
        return dict(self.tokenizer(inputs, return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        return self.model(self.model.params, **model_inputs)

    def postprocess(self, model_outputs, top_k: int = 1):
        probs = softmax_np(np.asarray(model_outputs.logits, np.float32))[0]
        id2label = self.model.config.id2label or {i: f"LABEL_{i}" for i in range(len(probs))}
        order = np.argsort(-probs)[:top_k]
        out = [{"label": id2label[int(i)], "score": float(probs[i])} for i in order]
        return out[0] if top_k == 1 else out


class TokenClassificationPipeline(Pipeline):
    """reference pipelines/token_classification.py (simple aggregation)."""

    def preprocess(self, inputs, **kwargs):
        enc = self.tokenizer(inputs, return_tensors="jax")
        return {"encoding": enc, "text": inputs}

    def _forward(self, model_inputs, **kwargs):
        out = self.model(self.model.params, **{k: v for k, v in model_inputs["encoding"].items()})
        return {"logits": np.asarray(out.logits), "encoding": model_inputs["encoding"]}

    def postprocess(self, model_outputs, **kwargs):
        logits = model_outputs["logits"][0]
        ids = np.asarray(model_outputs["encoding"]["input_ids"])[0]
        probs = softmax_np(logits.astype(np.float32))
        id2label = self.model.config.id2label or {}
        entities = []
        for idx, (tok_id, p) in enumerate(zip(ids, probs)):
            label_id = int(np.argmax(p))
            label = id2label.get(label_id, f"LABEL_{label_id}")
            if label == "O":
                continue
            entities.append({
                "entity": label, "score": float(p[label_id]), "index": idx,
                "word": self.tokenizer.decode([int(tok_id)]),
            })
        return entities


class FillMaskPipeline(Pipeline):
    """reference pipelines/fill_mask.py."""

    def preprocess(self, inputs, **kwargs):
        return dict(self.tokenizer(inputs, return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        out = self.model(self.model.params, **model_inputs)
        return {"logits": np.asarray(out.logits), "input_ids": np.asarray(model_inputs["input_ids"])}

    def postprocess(self, model_outputs, top_k: int = 5):
        ids = model_outputs["input_ids"][0]
        mask_id = self.tokenizer.mask_token_id
        positions = np.where(ids == mask_id)[0]
        results = []
        for pos in positions:
            probs = softmax_np(model_outputs["logits"][0, pos].astype(np.float32))
            order = np.argsort(-probs)[:top_k]
            results.append([
                {"token": int(t), "token_str": self.tokenizer.decode([int(t)]),
                 "score": float(probs[t]),
                 "sequence": self.tokenizer.decode(
                     [int(x) if i != pos else int(t) for i, x in enumerate(ids)],
                     skip_special_tokens=True)}
                for t in order
            ])
        return results[0] if len(results) == 1 else results


class FeatureExtractionPipeline(Pipeline):
    """reference pipelines/feature_extraction.py."""

    def preprocess(self, inputs, **kwargs):
        return dict(self.tokenizer(inputs, return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        return self.model(self.model.params, **model_inputs)

    def postprocess(self, model_outputs, **kwargs):
        return np.asarray(model_outputs.last_hidden_state).tolist()


class ZeroShotObjectDetectionPipeline(Pipeline):
    """reference pipelines/zero_shot_object_detection.py: OwlViT-family
    detector queried with free-text labels."""

    def preprocess(self, inputs, candidate_labels=None, **kwargs):
        if isinstance(inputs, dict):
            candidate_labels = inputs.get("candidate_labels", candidate_labels)
            image = inputs["image"]
        else:
            image = inputs
        if isinstance(candidate_labels, str):
            candidate_labels = [l.strip() for l in candidate_labels.split(",")]
        img = dict(self.image_processor(image, return_tensors="jax"))
        text = self.tokenizer(list(candidate_labels), return_tensors="jax", padding=True)
        return {"pixel_values": img["pixel_values"],
                "input_ids": text["input_ids"],
                "attention_mask": text.get("attention_mask"),
                "_labels": list(candidate_labels),
                "_target_size": tuple(img["pixel_values"].shape[-2:])}

    def _forward(self, model_inputs, **kwargs):
        labels = model_inputs.pop("_labels")
        size = model_inputs.pop("_target_size")
        out = self.model(self.model.params, **model_inputs)
        out["_labels"] = labels
        out["_target_size"] = size
        return out

    def postprocess(self, model_outputs, threshold: float = 0.1, **kwargs):
        labels = model_outputs.pop("_labels")
        size = model_outputs.pop("_target_size")
        results = type(self.model).post_process_grounded_object_detection(
            model_outputs, threshold=threshold, target_sizes=[size],
            text_labels=[labels])[0]
        return [{
            "score": float(s), "label": t,
            "box": {"xmin": float(b[0]), "ymin": float(b[1]),
                    "xmax": float(b[2]), "ymax": float(b[3])},
        } for s, t, b in zip(results["scores"], results["text_labels"], results["boxes"])]


class VideoClassificationPipeline(Pipeline):
    """reference pipelines/video_classification.py: frames -> video processor
    -> classifier -> top-k labels. Accepts a [T, C, H, W]/[T, H, W, C] array
    or a video file path (stdlib-decodable formats via video_utils)."""

    def preprocess(self, video, num_frames=None, **kwargs):
        if isinstance(video, str):
            from ..video_utils import load_video

            video, _ = load_video(video, num_frames=num_frames)
        feats = dict(self.video_processor(video, return_tensors="jax"))
        return {"pixel_values": feats["pixel_values_videos"][0][None]}

    def _forward(self, model_inputs, **kwargs):
        return self.model(self.model.params, **model_inputs)

    def postprocess(self, model_outputs, top_k: int = 5, **kwargs):
        probs = softmax_np(np.asarray(model_outputs.logits[0], np.float32))
        id2label = getattr(self.model.config, "id2label", {}) or {}
        order = np.argsort(-probs)[:top_k]
        return [{"label": id2label.get(int(i), f"LABEL_{int(i)}"), "score": float(probs[i])}
                for i in order]


class DepthEstimationPipeline(Pipeline):
    """reference pipelines/depth_estimation.py: depth map resized to the
    input image size."""

    def preprocess(self, image, **kwargs):
        inputs = dict(self.image_processor(image, return_tensors="jax"))
        inputs["_target_size"] = tuple(inputs["pixel_values"].shape[-2:])
        return inputs

    def _forward(self, model_inputs, **kwargs):
        size = model_inputs.pop("_target_size")
        out = self.model(self.model.params, **model_inputs)
        out["_target_size"] = size
        return out

    def postprocess(self, model_outputs, **kwargs):
        import jax

        size = model_outputs.pop("_target_size")
        depth = model_outputs.predicted_depth.astype("float32")[:, None]
        depth = jax.image.resize(depth, (depth.shape[0], 1, *size), method="bilinear")
        arr = np.asarray(depth[0, 0])
        return {"predicted_depth": arr,
                "depth": (255 * (arr - arr.min()) / max(arr.max() - arr.min(), 1e-6)).astype(np.uint8)}


class ImageSegmentationPipeline(Pipeline):
    """reference pipelines/image_segmentation.py (semantic subtask): upsample
    logits to the input size, argmax per pixel, one binary mask per present
    class."""

    def preprocess(self, image, **kwargs):
        inputs = dict(self.image_processor(image, return_tensors="jax"))
        inputs["_target_size"] = tuple(inputs["pixel_values"].shape[-2:])
        return inputs

    def _forward(self, model_inputs, **kwargs):
        size = model_inputs.pop("_target_size")
        out = self.model(self.model.params, **model_inputs)
        out["_target_size"] = size
        return out

    def postprocess(self, model_outputs, **kwargs):
        import jax

        size = model_outputs.pop("_target_size")
        logits = model_outputs.logits.astype("float32")
        up = jax.image.resize(logits, (logits.shape[0], logits.shape[1], *size),
                              method="bilinear")
        seg = np.asarray(up.argmax(1)[0])
        id2label = getattr(self.model.config, "id2label", {}) or {}
        results = []
        for label_id in np.unique(seg):
            results.append({
                "score": None,
                "label": id2label.get(int(label_id), f"LABEL_{int(label_id)}"),
                "mask": (seg == label_id),
            })
        return results


class ObjectDetectionPipeline(Pipeline):
    """reference pipelines/object_detection.py: DETR-family detector ->
    thresholded boxes in absolute pixel coordinates."""

    def preprocess(self, image, **kwargs):
        inputs = dict(self.image_processor(image, return_tensors="jax"))
        h, w = inputs["pixel_values"].shape[-2:]
        inputs["_target_size"] = (h, w)
        return inputs

    def _forward(self, model_inputs, **kwargs):
        size = model_inputs.pop("_target_size")
        out = self.model(self.model.params, **model_inputs)
        out["_target_size"] = size
        return out

    def postprocess(self, model_outputs, threshold: float = 0.5, **kwargs):
        size = model_outputs.pop("_target_size")
        results = type(self.model).post_process_object_detection(
            model_outputs, threshold=threshold, target_sizes=[size])[0]
        id2label = getattr(self.model.config, "id2label", {}) or {}
        return [{
            "score": float(s),
            "label": id2label.get(int(l), f"LABEL_{int(l)}"),
            "box": {"xmin": float(b[0]), "ymin": float(b[1]),
                    "xmax": float(b[2]), "ymax": float(b[3])},
        } for s, l, b in zip(results["scores"], results["labels"], results["boxes"])]


class AudioClassificationPipeline(Pipeline):
    """reference pipelines/audio_classification.py: raw waveform ->
    feature extractor -> audio classifier -> top-k labels."""

    def preprocess(self, audio, **kwargs):
        if isinstance(audio, dict):
            audio = audio.get("array", audio.get("raw"))
        audio = np.asarray(audio, np.float32)
        return dict(self.feature_extractor([audio], return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        return self.model(self.model.params, **model_inputs)

    def postprocess(self, model_outputs, top_k: int = 5, **kwargs):
        probs = softmax_np(np.asarray(model_outputs.logits[0], np.float32))
        id2label = getattr(self.model.config, "id2label", {}) or {}
        order = np.argsort(-probs)[:top_k]
        return [{"label": id2label.get(int(i), f"LABEL_{int(i)}"), "score": float(probs[i])}
                for i in order]


class ImageFeatureExtractionPipeline(Pipeline):
    """reference pipelines/image_feature_extraction.py."""

    def preprocess(self, image, **kwargs):
        return dict(self.image_processor(image, return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        return self.model(self.model.params, **model_inputs)

    def postprocess(self, model_outputs, pool: bool = False, **kwargs):
        if pool and getattr(model_outputs, "pooler_output", None) is not None:
            return np.asarray(model_outputs.pooler_output).tolist()
        return np.asarray(model_outputs.last_hidden_state).tolist()


class ImageClassificationPipeline(Pipeline):
    """reference pipelines/image_classification.py."""

    def preprocess(self, image, **kwargs):
        return dict(self.image_processor(image, return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        return self.model(self.model.params, **model_inputs)

    def postprocess(self, model_outputs, top_k: int = 5):
        probs = softmax_np(np.asarray(model_outputs.logits, np.float32))[0]
        id2label = self.model.config.id2label or {i: f"LABEL_{i}" for i in range(len(probs))}
        order = np.argsort(-probs)[: min(top_k, len(probs))]
        return [{"label": id2label[int(i)], "score": float(probs[i])} for i in order]


class ZeroShotImageClassificationPipeline(Pipeline):
    """reference pipelines/zero_shot_image_classification.py (CLIP/SigLIP)."""

    def __call__(self, image, candidate_labels=None, hypothesis_template="a photo of {}", **kwargs):
        return super().__call__(image, candidate_labels=candidate_labels,
                                hypothesis_template=hypothesis_template, **kwargs)

    def _sanitize_parameters(self, candidate_labels=None, hypothesis_template="a photo of {}", **kwargs):
        return {"candidate_labels": candidate_labels, "hypothesis_template": hypothesis_template}, {}, {}

    def preprocess(self, image, candidate_labels=None, hypothesis_template="a photo of {}"):
        texts = [hypothesis_template.format(l) for l in candidate_labels]
        enc = self.tokenizer(texts, return_tensors="jax", padding=True)
        img = self.image_processor(image, return_tensors="jax")
        return {"input_ids": enc["input_ids"], "attention_mask": enc.get("attention_mask"),
                "pixel_values": img["pixel_values"], "candidate_labels": candidate_labels}

    def _forward(self, model_inputs, **kwargs):
        labels = model_inputs.pop("candidate_labels")
        out = self.model(self.model.params, **model_inputs)
        return {"logits_per_image": np.asarray(out.logits_per_image), "candidate_labels": labels}

    def postprocess(self, model_outputs, **kwargs):
        probs = softmax_np(model_outputs["logits_per_image"][0].astype(np.float32))
        labels = model_outputs["candidate_labels"]
        order = np.argsort(-probs)
        return [{"label": labels[int(i)], "score": float(probs[i])} for i in order]


class AutomaticSpeechRecognitionPipeline(Pipeline):
    """reference pipelines/automatic_speech_recognition.py. Long-form audio
    runs the reference's *sequential* long-form strategy: consecutive
    windows of chunk_length_s, each decoded by one jitted generate, texts
    concatenated (the seek loop of generation_whisper.py:970 at the pipeline
    level — host control flow, device per-chunk programs).

    Temperature fallback (reference generate_with_fallback
    generation_whisper.py:970): each chunk decodes greedily first, then
    retries at increasing temperatures when the output fails quality checks —
    zlib compression ratio > ``compression_ratio_threshold`` (repetition
    loops) or mean token logprob < ``logprob_threshold``. The jitted
    per-(temperature, shape) programs are cached, so fallback costs nothing
    when the greedy pass is accepted."""

    def _sanitize_parameters(self, chunk_length_s=None, temperature=None,
                             compression_ratio_threshold=None,
                             logprob_threshold=None, **kwargs):
        fwd = {}
        if temperature is not None:
            fwd["temperature"] = temperature
        if compression_ratio_threshold is not None:
            fwd["compression_ratio_threshold"] = compression_ratio_threshold
        if logprob_threshold is not None:
            fwd["logprob_threshold"] = logprob_threshold
        return {"chunk_length_s": chunk_length_s}, {**fwd, **kwargs}, {}

    def preprocess(self, audio, chunk_length_s=None):
        if isinstance(audio, dict):
            audio = audio.get("array", audio.get("raw"))
        audio = np.asarray(audio, np.float32)
        sr = self.feature_extractor.sampling_rate
        window = int((chunk_length_s or self.feature_extractor.chunk_length) * sr)
        chunks = [audio[i : i + window] for i in range(0, max(len(audio), 1), window)]
        feats = [dict(self.feature_extractor([c], return_tensors="jax")) for c in chunks if len(c)]
        return {"chunks": feats}

    def _forward(self, model_inputs, temperature=None,
                 compression_ratio_threshold=2.4, logprob_threshold=-1.0,
                 **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 128)
        temps = temperature if isinstance(temperature, (tuple, list)) else (
            (temperature,) if temperature is not None else (0.0,))
        tokens = []
        for feats in model_inputs["chunks"]:
            chosen = None
            for t in temps:
                out, avg_lp = self.model.generate(
                    self.model.params, input_features=feats["input_features"],
                    do_sample=t > 0, temperature=max(float(t), 1e-5),
                    return_avg_logprobs=True, **generate_kwargs)
                ids = np.asarray(out)[0]
                chosen = ids
                if len(temps) == 1:
                    break
                if self._chunk_acceptable(ids, float(np.asarray(avg_lp)[0]),
                                          compression_ratio_threshold, logprob_threshold):
                    break
            tokens.append(chosen)
        return {"token_chunks": tokens}

    def _chunk_acceptable(self, ids, avg_logprob, compression_ratio_threshold,
                          logprob_threshold) -> bool:
        """reference generation_whisper.py needs_fallback: repetition via zlib
        compression ratio, confidence via mean token logprob."""
        import zlib

        if logprob_threshold is not None and avg_logprob < logprob_threshold:
            return False
        if compression_ratio_threshold is not None:
            text = self.tokenizer.decode([int(t) for t in ids], skip_special_tokens=True)
            raw = text.encode("utf-8")
            if raw and len(raw) / len(zlib.compress(raw)) > compression_ratio_threshold:
                return False
        return True

    def postprocess(self, model_outputs, **kwargs):
        text = "".join(
            self.tokenizer.decode([int(t) for t in chunk], skip_special_tokens=True)
            for chunk in model_outputs["token_chunks"])
        return {"text": text}


class ImageTextToTextPipeline(Pipeline):
    """reference pipelines/image_text_to_text.py (LLaVA-family)."""

    def preprocess(self, inputs, **kwargs):
        images = inputs.get("images")
        text = inputs.get("text")
        return dict(self.processor(text=text, images=images, return_tensors="jax"))

    def _forward(self, model_inputs, **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 32)
        out = self.model.generate(self.model.params,
                                  input_ids=model_inputs["input_ids"],
                                  pixel_values=model_inputs["pixel_values"],
                                  **generate_kwargs)
        prompt_len = model_inputs["input_ids"].shape[1]
        return {"sequences": np.asarray(out), "prompt_len": prompt_len}

    def postprocess(self, model_outputs, **kwargs):
        seq = model_outputs["sequences"][0]
        gen = seq[model_outputs["prompt_len"]:]
        return [{"generated_text": self.processor.tokenizer.decode(
            [int(t) for t in gen], skip_special_tokens=True)}]


class QuestionAnsweringPipeline(Pipeline):
    """reference pipelines/question_answering.py (simplified span decode)."""

    def __call__(self, question=None, context=None, **kwargs):
        if isinstance(question, dict):
            return super().__call__(question, **kwargs)
        return super().__call__({"question": question, "context": context}, **kwargs)

    def preprocess(self, inputs, **kwargs):
        enc = self.tokenizer(inputs["question"], inputs["context"], return_tensors="jax",
                             return_token_type_ids=True)
        return {"encoding": enc, "context": inputs["context"]}

    def _forward(self, model_inputs, **kwargs):
        enc = model_inputs["encoding"]
        out = self.model(self.model.params,
                         **{k: v for k, v in enc.items() if k != "token_type_ids"})
        return {"start": np.asarray(out.start_logits)[0], "end": np.asarray(out.end_logits)[0],
                "encoding": enc, "context": model_inputs["context"]}

    def postprocess(self, model_outputs, top_k: int = 1, max_answer_len: int = 15):
        start, end = model_outputs["start"], model_outputs["end"]
        ids = np.asarray(model_outputs["encoding"]["input_ids"])[0]
        # joint argmax over valid (s <= e < s + max_len) spans
        scores = start[:, None] + end[None, :]
        mask = np.triu(np.ones_like(scores, dtype=bool))
        mask &= np.tril(np.ones_like(scores, dtype=bool), k=max_answer_len - 1)
        scores = np.where(mask, scores, -np.inf)
        flat = scores.reshape(-1)
        order = np.argsort(-flat)[:top_k]
        results = []
        e_x = np.exp(start - start.max())
        p_start = e_x / e_x.sum()
        e_y = np.exp(end - end.max())
        p_end = e_y / e_y.sum()
        for idx in order:
            s, e = divmod(int(idx), scores.shape[1])
            answer = self.tokenizer.decode([int(t) for t in ids[s : e + 1]],
                                           skip_special_tokens=True).strip()
            results.append({"answer": answer, "score": float(p_start[s] * p_end[e]),
                            "start": s, "end": e})
        return results[0] if top_k == 1 else results


class ZeroShotClassificationPipeline(Pipeline):
    """reference pipelines/zero_shot_classification.py (NLI-based)."""

    def __call__(self, sequences, candidate_labels=None,
                 hypothesis_template="This example is {}.", **kwargs):
        batched = isinstance(sequences, list)
        items = sequences if batched else [sequences]
        outs = [self._classify(s, candidate_labels, hypothesis_template) for s in items]
        return outs if batched else outs[0]

    def _entailment_index(self) -> int:
        label2id = {k.lower(): v for k, v in (self.model.config.label2id or {}).items()}
        return label2id.get("entailment", -1)

    def _classify(self, sequence, labels, template):
        import jax.numpy as jnp

        entail = self._entailment_index()
        scores = []
        for label in labels:
            enc = self.tokenizer(sequence, template.format(label), return_tensors="jax")
            logits = np.asarray(self.model(self.model.params, **enc).logits)[0]
            probs = softmax_np(logits)
            scores.append(float(probs[entail]))
        scores = np.asarray(scores)
        scores = scores / scores.sum()
        order = np.argsort(-scores)
        return {"sequence": sequence,
                "labels": [labels[i] for i in order],
                "scores": [float(scores[i]) for i in order]}


class Text2TextGenerationPipeline(Pipeline):
    """reference pipelines/text2text_generation.py (T5/BART)."""

    return_name = "generated"

    def preprocess(self, inputs, **kwargs):
        return dict(self.tokenizer(inputs, return_tensors="jax"))

    def _forward(self, model_inputs, **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 32)
        out = self.model.generate(self.model.params, input_ids=model_inputs["input_ids"],
                                  attention_mask=model_inputs.get("attention_mask"),
                                  **generate_kwargs)
        return {"tokens": np.asarray(out)}

    def postprocess(self, model_outputs, **kwargs):
        text = self.tokenizer.decode([int(t) for t in model_outputs["tokens"][0]],
                                     skip_special_tokens=True)
        return [{f"{self.return_name}_text": text}]


class SummarizationPipeline(Text2TextGenerationPipeline):
    return_name = "summary"


class TranslationPipeline(Text2TextGenerationPipeline):
    return_name = "translation"


class ImageToTextPipeline(Pipeline):
    """reference pipelines/image_to_text.py (BLIP-family captioners): image
    (+ optional text prompt) -> generated caption, full sequence decoded with
    special tokens skipped."""

    def _sanitize_parameters(self, prompt=None, max_new_tokens=None, generate_kwargs=None, **kwargs):
        fwd = dict(generate_kwargs or {})
        if max_new_tokens is not None:
            fwd["max_new_tokens"] = max_new_tokens
        return {"prompt": prompt}, fwd, {}

    def preprocess(self, image, prompt=None):
        if isinstance(image, dict):
            prompt = image.get("prompt", prompt)
            image = image["image"]
        return dict(self.processor(images=image, text=prompt, return_tensors="jax"))

    def _forward(self, model_inputs, **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 32)
        out = self.model.generate(self.model.params,
                                  pixel_values=model_inputs["pixel_values"],
                                  input_ids=model_inputs.get("input_ids"),
                                  attention_mask=model_inputs.get("attention_mask"),
                                  **generate_kwargs)
        return {"sequences": np.asarray(out)}

    def postprocess(self, model_outputs, **kwargs):
        tok = self.processor.tokenizer if self.processor is not None else self.tokenizer
        return [{"generated_text": tok.decode([int(t) for t in seq], skip_special_tokens=True)}
                for seq in model_outputs["sequences"]]


class VisualQuestionAnsweringPipeline(Pipeline):
    """reference pipelines/visual_question_answering.py, generative route
    (BLIP): encode image+question, decode the free-form answer."""

    def __call__(self, image=None, question=None, **kwargs):
        if isinstance(image, dict):
            return super().__call__(image, **kwargs)
        return super().__call__({"image": image, "question": question}, **kwargs)

    def _sanitize_parameters(self, top_k=None, max_new_tokens=None, generate_kwargs=None, **kwargs):
        fwd = dict(generate_kwargs or {})
        if max_new_tokens is not None:
            fwd["max_new_tokens"] = max_new_tokens
        post = {} if top_k is None else {"top_k": top_k}
        return {}, fwd, post

    def preprocess(self, inputs, **kwargs):
        return dict(self.processor(images=inputs["image"], text=inputs["question"],
                                   return_tensors="jax"))

    def _forward(self, model_inputs, **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 16)
        out = self.model.generate(self.model.params,
                                  input_ids=model_inputs["input_ids"],
                                  pixel_values=model_inputs["pixel_values"],
                                  attention_mask=model_inputs.get("attention_mask"),
                                  **generate_kwargs)
        return {"sequences": np.asarray(out)}

    def postprocess(self, model_outputs, **kwargs):
        tok = self.processor.tokenizer if self.processor is not None else self.tokenizer
        return [{"answer": tok.decode([int(t) for t in seq], skip_special_tokens=True)}
                for seq in model_outputs["sequences"]]


class DocumentQuestionAnsweringPipeline(Pipeline):
    """reference pipelines/document_question_answering.py.

    Extractive QA over OCR'd document words with 2D boxes (LayoutLM).
    ``word_boxes`` — a list of ``(word, [x0, y0, x1, y1])`` with coordinates
    normalized to 0-1000 — must be provided (the reference shells out to
    tesseract when absent; host OCR is out of scope here).
    """

    def __call__(self, image=None, question=None, word_boxes=None, **kwargs):
        if isinstance(image, dict):
            return super().__call__(image, **kwargs)
        return super().__call__({"image": image, "question": question,
                                 "word_boxes": word_boxes}, **kwargs)

    def _sanitize_parameters(self, top_k=None, max_answer_len=None, **kwargs):
        post = {}
        if top_k is not None:
            post["top_k"] = top_k
        if max_answer_len is not None:
            post["max_answer_len"] = max_answer_len
        return {}, {}, post

    def preprocess(self, inputs, **kwargs):
        import jax.numpy as jnp

        if not inputs.get("word_boxes"):
            raise ValueError(
                "document-question-answering requires word_boxes=[(word, box), ...] "
                "with boxes normalized to 0-1000 (no in-tree OCR).")
        tok = self.tokenizer
        words = [w for w, _ in inputs["word_boxes"]]
        boxes = [list(b) for _, b in inputs["word_boxes"]]
        q_ids = tok(inputs["question"], add_special_tokens=False)["input_ids"]
        ids = [tok.cls_token_id] + list(q_ids) + [tok.sep_token_id]
        bbox = [[0, 0, 0, 0]] * len(ids)
        type_ids = [0] * len(ids)
        word_of_token = [-1] * len(ids)
        for wi, (word, box) in enumerate(zip(words, boxes)):
            sub = tok(word, add_special_tokens=False)["input_ids"]
            ids += list(sub)
            bbox += [box] * len(sub)
            type_ids += [1] * len(sub)
            word_of_token += [wi] * len(sub)
        ids.append(tok.sep_token_id)
        bbox.append([1000, 1000, 1000, 1000])
        type_ids.append(1)
        word_of_token.append(-1)
        return {
            "input_ids": jnp.asarray([ids], jnp.int32),
            "bbox": jnp.asarray([bbox], jnp.int32),
            "token_type_ids": jnp.asarray([type_ids], jnp.int32),
            "words": words,
            "word_of_token": np.asarray(word_of_token),
        }

    def _forward(self, model_inputs, **kwargs):
        out = self.model(self.model.params,
                         input_ids=model_inputs["input_ids"],
                         bbox=model_inputs["bbox"],
                         token_type_ids=model_inputs["token_type_ids"])
        return {"start": np.asarray(out.start_logits)[0],
                "end": np.asarray(out.end_logits)[0],
                "words": model_inputs["words"],
                "word_of_token": model_inputs["word_of_token"]}

    def postprocess(self, model_outputs, top_k: int = 1, max_answer_len: int = 15):
        start, end = model_outputs["start"], model_outputs["end"]
        word_of = model_outputs["word_of_token"]
        words = model_outputs["words"]
        # restrict to context (word) tokens
        context = word_of >= 0
        neg = -np.inf
        start = np.where(context, start, neg)
        end = np.where(context, end, neg)
        scores = start[:, None] + end[None, :]
        mask = np.triu(np.ones_like(scores, dtype=bool))
        mask &= np.tril(np.ones_like(scores, dtype=bool), k=max_answer_len - 1)
        scores = np.where(mask, scores, neg)
        order = np.argsort(-scores.reshape(-1))[:top_k]
        results = []
        for idx in order:
            s, e = divmod(int(idx), scores.shape[1])
            answer = " ".join(words[word_of[s]: word_of[e] + 1])
            results.append({"answer": answer, "score": float(scores[s, e]),
                            "start": int(word_of[s]), "end": int(word_of[e])})
        return results[0] if top_k == 1 else results


class MaskGenerationPipeline(Pipeline):
    """reference pipelines/mask_generation.py (SAM automatic mask generation).

    A grid of ``points_per_side`` x ``points_per_side`` query points is run
    through SAM in batches; candidate masks are filtered by predicted IoU and
    stability score at low resolution, deduplicated with box-NMS, and the
    survivors upsampled to the original image size.
    """

    def __call__(self, image, **kwargs):
        return super().__call__(image, **kwargs)

    def _sanitize_parameters(self, points_per_side=None, points_per_batch=None,
                             pred_iou_thresh=None, stability_score_thresh=None,
                             stability_score_offset=None, box_nms_thresh=None,
                             mask_threshold=None, **kwargs):
        pre = {}
        if points_per_side is not None:
            pre["points_per_side"] = points_per_side
        fwd = {}
        if points_per_batch is not None:
            fwd["points_per_batch"] = points_per_batch
        post = {k: v for k, v in dict(
            pred_iou_thresh=pred_iou_thresh,
            stability_score_thresh=stability_score_thresh,
            stability_score_offset=stability_score_offset,
            box_nms_thresh=box_nms_thresh, mask_threshold=mask_threshold,
        ).items() if v is not None}
        return pre, fwd, post

    def preprocess(self, image, points_per_side: int = 32):
        import jax.numpy as jnp

        feats = self.image_processor(image, return_tensors="jax")
        original = feats["original_sizes"][0]
        reshaped = feats["reshaped_input_sizes"][0]
        # normalized center grid scaled to the reshaped frame (reference
        # build_point_grid)
        offset = 1.0 / (2 * points_per_side)
        coords_1d = np.linspace(offset, 1.0 - offset, points_per_side)
        grid = np.stack(np.meshgrid(coords_1d, coords_1d), axis=-1).reshape(-1, 2)
        pts = np.zeros_like(grid)
        pts[:, 0] = grid[:, 0] * reshaped[1]  # x
        pts[:, 1] = grid[:, 1] * reshaped[0]  # y
        return {"pixel_values": feats["pixel_values"], "points": pts,
                "original_size": original, "reshaped_size": reshaped}

    def _forward(self, model_inputs, points_per_batch: int = 64):
        import jax.numpy as jnp

        model = self.model
        embeddings = model.get_image_embeddings(model.params, model_inputs["pixel_values"])
        pts = model_inputs["points"]
        all_masks, all_scores = [], []
        for i in range(0, len(pts), points_per_batch):
            chunk = pts[i : i + points_per_batch]
            input_points = jnp.asarray(chunk, jnp.float32)[None, :, None, :]  # [1, pb, 1, 2]
            labels = jnp.ones((1, len(chunk), 1), jnp.int32)
            out = model(model.params, image_embeddings=embeddings,
                        input_points=input_points, input_labels=labels,
                        multimask_output=True)
            all_masks.append(np.asarray(out.pred_masks[0]))   # [pb, 3, h, w]
            all_scores.append(np.asarray(out.iou_scores[0]))  # [pb, 3]
        masks = np.concatenate(all_masks, axis=0).reshape(-1, *all_masks[0].shape[-2:])
        scores = np.concatenate(all_scores, axis=0).reshape(-1)
        return {"low_res_masks": masks, "iou_scores": scores,
                "original_size": model_inputs["original_size"],
                "reshaped_size": model_inputs["reshaped_size"]}

    @staticmethod
    def _boxes_from_masks(masks: np.ndarray) -> np.ndarray:
        """[N, H, W] bool -> [N, 4] xyxy (0-area boxes for empty masks)."""
        n, h, w = masks.shape
        any_x = masks.any(axis=1)  # [N, W]
        any_y = masks.any(axis=2)  # [N, H]
        x0 = np.where(any_x.any(-1), any_x.argmax(-1), 0)
        x1 = np.where(any_x.any(-1), w - any_x[:, ::-1].argmax(-1), 0)
        y0 = np.where(any_y.any(-1), any_y.argmax(-1), 0)
        y1 = np.where(any_y.any(-1), h - any_y[:, ::-1].argmax(-1), 0)
        return np.stack([x0, y0, x1, y1], axis=-1).astype(np.float32)

    def postprocess(self, model_outputs, pred_iou_thresh: float = 0.88,
                    stability_score_thresh: float = 0.95,
                    stability_score_offset: float = 1.0,
                    box_nms_thresh: float = 0.7, mask_threshold: float = 0.0):
        logits = model_outputs["low_res_masks"]  # [N, h, w]
        scores = model_outputs["iou_scores"]

        keep = scores > pred_iou_thresh
        # stability: IoU of the mask thresholded at +/- offset (reference
        # amg.py compute_stability_score)
        hi = (logits > mask_threshold + stability_score_offset).sum((-1, -2))
        lo = (logits > mask_threshold - stability_score_offset).sum((-1, -2))
        stability = hi / np.maximum(lo, 1)
        keep &= stability > stability_score_thresh
        binary = logits > mask_threshold
        keep &= binary.any((-1, -2))
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return {"masks": [], "scores": []}
        binary, scores = binary[idx], scores[idx]

        # greedy box-NMS by score
        boxes = self._boxes_from_masks(binary)
        order = np.argsort(-scores)
        kept = []
        for i in order:
            ok = True
            for j in kept:
                xx0 = max(boxes[i, 0], boxes[j, 0]); yy0 = max(boxes[i, 1], boxes[j, 1])
                xx1 = min(boxes[i, 2], boxes[j, 2]); yy1 = min(boxes[i, 3], boxes[j, 3])
                inter = max(0.0, xx1 - xx0) * max(0.0, yy1 - yy0)
                a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / max(a + b - inter, 1e-6) > box_nms_thresh:
                    ok = False
                    break
            if ok:
                kept.append(i)
        binary, scores = binary[kept], scores[kept]

        full = self.image_processor.post_process_masks(
            logits[idx][kept][None, :, None], [model_outputs["original_size"]],
            [model_outputs["reshaped_size"]], mask_threshold=mask_threshold)[0][:, 0]
        return {"masks": [np.asarray(m) for m in full],
                "scores": [float(s) for s in scores]}


class KeypointMatchingPipeline(Pipeline):
    """reference pipelines/keypoint_matching.py (SuperGlue)."""

    def __call__(self, images, **kwargs):
        # a single pair [img0, img1] or a list of pairs
        if isinstance(images, (list, tuple)) and len(images) == 2 and not (
                isinstance(images[0], (list, tuple))):
            return super().__call__([list(images)], **kwargs)[0]
        return super().__call__([list(p) for p in images], **kwargs)

    def _sanitize_parameters(self, threshold=None, **kwargs):
        post = {} if threshold is None else {"threshold": threshold}
        return {}, {}, post

    def preprocess(self, pair, **kwargs):
        from ..image_processing_utils import load_image

        arrays = [load_image(im) for im in pair]
        feats = self.image_processor.preprocess([arrays], return_tensors="jax")
        sizes = [(a.shape[-2], a.shape[-1]) for a in arrays]
        return {"pixel_values": feats["pixel_values"], "target_sizes": [sizes]}

    def _forward(self, model_inputs, **kwargs):
        out = self.model(self.model.params, pixel_values=model_inputs["pixel_values"])
        return {"outputs": out, "target_sizes": model_inputs["target_sizes"]}

    def postprocess(self, model_outputs, threshold: float = 0.0):
        res = self.image_processor.post_process_keypoint_matching(
            model_outputs["outputs"], model_outputs["target_sizes"], threshold=threshold)[0]
        matches = []
        for kp0, kp1, s in zip(res["keypoints0"], res["keypoints1"], res["matching_scores"]):
            matches.append({
                "keypoint_image_0": {"x": float(kp0[0]), "y": float(kp0[1])},
                "keypoint_image_1": {"x": float(kp1[0]), "y": float(kp1[1])},
                "score": float(s),
            })
        return sorted(matches, key=lambda m: m["score"], reverse=True)


class TextToAudioPipeline(Pipeline):
    """reference pipelines/text_to_audio.py (VITS text-to-waveform)."""

    def __call__(self, text, **kwargs):
        return super().__call__(text, **kwargs)

    def _sanitize_parameters(self, speaking_rate=None, **kwargs):
        fwd = {} if speaking_rate is None else {"speaking_rate": speaking_rate}
        return {}, fwd, {}

    def preprocess(self, text, **kwargs):
        return dict(self.tokenizer(text, return_tensors="jax"))

    def _forward(self, model_inputs, **kwargs):
        out = self.model(self.model.params, input_ids=model_inputs["input_ids"],
                         attention_mask=model_inputs.get("attention_mask"), **kwargs)
        return out

    def postprocess(self, out):
        n = int(np.asarray(out.sequence_lengths)[0])
        return {"audio": np.asarray(out.waveform)[0][:n],
                "sampling_rate": self.model.config.sampling_rate}


class ZeroShotAudioClassificationPipeline(Pipeline):
    """reference pipelines/zero_shot_audio_classification.py (CLAP)."""

    def __call__(self, audios, candidate_labels=None, **kwargs):
        return super().__call__(audios, candidate_labels=candidate_labels, **kwargs)

    def _sanitize_parameters(self, candidate_labels=None,
                             hypothesis_template="This is a sound of {}.", **kwargs):
        return {"candidate_labels": candidate_labels,
                "hypothesis_template": hypothesis_template}, {}, {}

    def preprocess(self, audio, candidate_labels=None,
                   hypothesis_template="This is a sound of {}."):
        feats = self.feature_extractor(audio, return_tensors="jax")
        texts = [hypothesis_template.format(lbl) for lbl in candidate_labels]
        enc = self.tokenizer(texts, return_tensors="jax", padding=True)
        return {"input_features": feats["input_features"],
                "input_ids": enc["input_ids"], "attention_mask": enc["attention_mask"],
                "candidate_labels": candidate_labels}

    def _forward(self, model_inputs, **kwargs):
        out = self.model(self.model.params,
                         input_ids=model_inputs["input_ids"],
                         attention_mask=model_inputs["attention_mask"],
                         input_features=model_inputs["input_features"])
        return {"logits": np.asarray(out.logits_per_audio)[0],
                "candidate_labels": model_inputs["candidate_labels"]}

    def postprocess(self, model_outputs):
        probs = softmax_np(model_outputs["logits"])
        results = [{"score": float(s), "label": l}
                   for s, l in zip(probs, model_outputs["candidate_labels"])]
        return sorted(results, key=lambda r: -r["score"])


class TableQuestionAnsweringPipeline(Pipeline):
    """reference pipelines/table_question_answering.py: TAPAS cell selection
    + aggregation. ``table`` is a dict of column -> list of cell strings (or
    a pandas DataFrame); answers are the selected cells, prefixed with the
    argmax aggregator when the head predicts one."""

    AGGREGATORS = ["NONE", "SUM", "AVERAGE", "COUNT"]

    def __call__(self, table=None, query=None, **kwargs):
        if isinstance(table, dict) and "table" in table:
            return super().__call__(table, **kwargs)
        return super().__call__({"table": table, "query": query}, **kwargs)

    def preprocess(self, inputs, **kwargs):
        from ..models.tapas.tokenization_tapas import TapasTableEncoder

        table = inputs["table"]
        if hasattr(table, "to_dict"):  # pandas
            table = {c: [str(v) for v in table[c].tolist()] for c in table.columns}
        enc = TapasTableEncoder(self.tokenizer).encode(table, inputs["query"])
        return {"encoding": enc, "table": table}

    def _forward(self, model_inputs, **kwargs):
        import jax.numpy as jnp

        enc = model_inputs["encoding"]
        out = self.model(self.model.params,
                         input_ids=jnp.asarray(enc["input_ids"]),
                         attention_mask=jnp.asarray(enc["attention_mask"]),
                         token_type_ids=jnp.asarray(enc["token_type_ids"]))
        return {"logits": np.asarray(out.logits),
                "agg": (None if getattr(out, "logits_aggregation", None) is None
                        else np.asarray(out.logits_aggregation)),
                "encoding": enc, "table": model_inputs["table"]}

    def postprocess(self, model_outputs, **kwargs):
        enc = model_outputs["encoding"]
        table = model_outputs["table"]
        cols = list(table.keys())
        logits = np.clip(model_outputs["logits"][0], -30.0, 30.0)
        probs = 1.0 / (1.0 + np.exp(-logits))
        tt = enc["token_type_ids"][0]
        mask = enc["attention_mask"][0]
        # mean prob per (row, col) cell over its subword tokens; > 0.5 selects
        sums: dict = {}
        counts: dict = {}
        for i in range(len(mask)):
            if not mask[i]:
                continue
            seg, col, row = int(tt[i][0]), int(tt[i][1]), int(tt[i][2])
            if seg == 1 and col > 0 and row > 0:
                key = (row, col)
                sums[key] = sums.get(key, 0.0) + float(probs[i])
                counts[key] = counts.get(key, 0) + 1
        coords = sorted(k for k in sums if sums[k] / counts[k] > 0.5)
        cells = [str(table[cols[c - 1]][r - 1]) for r, c in coords]
        agg = "NONE"
        if model_outputs["agg"] is not None:
            agg = self.AGGREGATORS[int(model_outputs["agg"][0].argmax())]
        answer = ", ".join(cells)
        if agg != "NONE":
            answer = f"{agg} > {answer}"
        return {"answer": answer if cells else "",
                "coordinates": [(r - 1, c - 1) for r, c in coords],
                "cells": cells, "aggregator": agg}


class AnyToAnyPipeline(Pipeline):
    """reference pipelines/any_to_any.py: omni models — any mix of
    text/images/audio/videos in, text (or image tokens) out, routed through
    the family's AutoProcessor."""

    def __call__(self, text=None, images=None, audio=None, videos=None, **kwargs):
        if isinstance(text, dict):
            return super().__call__(text, **kwargs)
        return super().__call__({"text": text, "images": images,
                                 "audio": audio, "videos": videos}, **kwargs)

    def preprocess(self, inputs, **kwargs):
        feed = {k: v for k, v in inputs.items() if v is not None}
        return dict(self.processor(return_tensors="jax", **feed))

    def _forward(self, model_inputs, generation_mode="text", **generate_kwargs):
        generate_kwargs.setdefault("max_new_tokens", 32)
        ids = model_inputs.pop("input_ids")
        model_inputs.pop("attention_mask", None)
        extras = {k: v for k, v in model_inputs.items()
                  if k in getattr(self.model, "_prefill_input_names", ())}
        out = self.model.generate(self.model.params, input_ids=ids,
                                  **extras, **generate_kwargs)
        return {"sequences": np.asarray(out), "prompt_len": ids.shape[1],
                "generation_mode": generation_mode}

    def postprocess(self, model_outputs, **kwargs):
        seq = model_outputs["sequences"][0]
        gen = [int(t) for t in seq[model_outputs["prompt_len"]:]]
        if model_outputs.get("generation_mode") == "image" and hasattr(
                self.model, "decode_image_tokens"):
            return [{"generated_tokens": gen}]
        return [{"generated_text": self.processor.tokenizer.decode(
            gen, skip_special_tokens=True)}]
