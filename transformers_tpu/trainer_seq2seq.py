"""Seq2SeqTrainer — generate-based evaluation/prediction.

TPU-native analog of reference src/transformers/trainer_seq2seq.py
(``Seq2SeqTrainer.evaluate`` :139 / ``predict`` :195 / ``prediction_step``
:259) and training_args_seq2seq.py. With ``predict_with_generate=True`` the
eval loop calls the model's jitted ``generate`` per batch — the bucketed
prefill + while_loop decode program compiles once per shape signature — and
hands (padded) generated ids to ``compute_metrics``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np

from .trainer import Trainer
from .training_args import TrainingArguments
from .utils import logging

logger = logging.get_logger(__name__)


@dataclass
class Seq2SeqTrainingArguments(TrainingArguments):
    """reference training_args_seq2seq.py:30."""

    predict_with_generate: bool = False
    generation_max_length: Optional[int] = None
    generation_num_beams: Optional[int] = None
    generation_config: Optional[Any] = None


class Seq2SeqTrainer(Trainer):
    """reference trainer_seq2seq.py:55."""

    def _gen_kwargs(self, **overrides) -> dict:
        args = self.args
        kw: dict[str, Any] = {"do_sample": False}
        if getattr(args, "generation_max_length", None):
            kw["max_new_tokens"] = int(args.generation_max_length)
        if getattr(args, "generation_num_beams", None):
            kw["num_beams"] = int(args.generation_num_beams)
        gc = getattr(args, "generation_config", None)
        if gc is not None:
            kw["generation_config"] = gc
        kw.update({k: v for k, v in overrides.items() if v is not None})
        kw.setdefault("max_new_tokens", 20)
        return kw

    def _pad_to(self, arrays: list[np.ndarray], pad_id: int) -> np.ndarray:
        width = max(a.shape[1] for a in arrays)
        out = [np.pad(a, ((0, 0), (0, width - a.shape[1])), constant_values=pad_id)
               for a in arrays]
        return np.concatenate(out, axis=0)

    def _generation_loop(self, dataset, metric_key_prefix: str, **gen_kwargs):
        model = self.model
        main_input = getattr(model, "encoder_input_name", None) or \
            getattr(model, "main_input_name", "input_ids")
        pad_id = getattr(model.config, "pad_token_id", None) or 0
        kw = self._gen_kwargs(**gen_kwargs)

        @jax.jit
        def loss_step(params, batch):
            return model(params, **batch).loss

        losses, preds, labels = [], [], []
        for batch in self.get_eval_dataloader(dataset):
            batch = {k: np.asarray(v) for k, v in batch.items()}
            lab = batch.get("labels")
            if lab is not None:
                jbatch = {k: self._put_batch_leaf(v) for k, v in batch.items()}
                losses.append(float(loss_step(self.params, jbatch)))
                labels.append(lab)
            gen_inputs = {main_input: batch[main_input]}
            if "attention_mask" in batch:
                gen_inputs["attention_mask"] = batch["attention_mask"]
            out = model.generate(self.params, **gen_inputs, **kw)
            preds.append(np.asarray(out))

        metrics = {}
        if losses:
            metrics[f"{metric_key_prefix}_loss"] = float(np.mean(losses))
        all_preds = self._pad_to(preds, pad_id) if preds else None
        all_labels = self._pad_to(labels, -100) if labels else None
        if self.compute_metrics is not None and all_preds is not None:
            extra = self.compute_metrics((all_preds, all_labels))
            metrics.update({f"{metric_key_prefix}_{k}": v for k, v in extra.items()})
        return metrics, all_preds, all_labels

    def evaluate(self, eval_dataset=None, metric_key_prefix: str = "eval",
                 **gen_kwargs) -> dict:
        if not getattr(self.args, "predict_with_generate", False):
            return super().evaluate(eval_dataset, metric_key_prefix)
        dataset = eval_dataset or self.eval_dataset
        metrics, _, _ = self._generation_loop(dataset, metric_key_prefix, **gen_kwargs)
        self.state.log_history.append(metrics)
        self.control = self.callback_handler.call_event(
            "on_evaluate", self.args, self.state, self.control, metrics=metrics)
        return metrics

    def predict(self, test_dataset, metric_key_prefix: str = "test", **gen_kwargs):
        if not getattr(self.args, "predict_with_generate", False):
            return super().predict(test_dataset)
        metrics, preds, labels = self._generation_loop(
            test_dataset, metric_key_prefix, **gen_kwargs)
        return preds, labels, metrics
