"""Seq2SeqTrainer: predict_with_generate eval, generate parity, train smoke."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu import Seq2SeqTrainer, Seq2SeqTrainingArguments  # noqa: E402


def tiny_t5():
    from transformers_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    config = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                      num_layers=2, num_heads=4, decoder_start_token_id=0,
                      pad_token_id=0, eos_token_id=1)
    return T5ForConditionalGeneration(config)


def s2s_dataset(n=16, seq=8, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(2, vocab, size=(n, seq))
    tgt = rng.integers(2, vocab, size=(n, seq))
    return [{"input_ids": s, "attention_mask": np.ones_like(s), "labels": t}
            for s, t in zip(src, tgt)]


def test_predict_with_generate(tmp_path):
    model = tiny_t5()
    seen = {}

    def compute_metrics(eval_pred):
        preds, labels = eval_pred
        seen["preds"], seen["labels"] = preds, labels
        return {"pred_tokens": int(preds.shape[0] * preds.shape[1])}

    args = Seq2SeqTrainingArguments(
        output_dir=str(tmp_path), per_device_eval_batch_size=1,
        predict_with_generate=True, generation_max_length=6,
        save_strategy="no", seed=0)
    trainer = Seq2SeqTrainer(model, args, train_dataset=s2s_dataset(),
                             eval_dataset=s2s_dataset(8, seed=1),
                             compute_metrics=compute_metrics)
    metrics = trainer.evaluate()
    assert "eval_loss" in metrics and np.isfinite(metrics["eval_loss"])
    assert metrics["eval_pred_tokens"] > 0
    assert seen["preds"].shape[0] == 8
    assert seen["labels"].shape[0] == 8

    # the eval-loop generations match calling generate directly
    ds = s2s_dataset(8, seed=1)
    batch = np.stack([r["input_ids"] for r in ds])
    direct = np.asarray(model.generate(
        trainer.params, input_ids=batch,
        attention_mask=np.ones_like(batch), max_new_tokens=6, do_sample=False))
    got = seen["preds"][:, : direct.shape[1]]
    assert np.array_equal(got, direct)


def test_predict_returns_triple(tmp_path):
    model = tiny_t5()
    args = Seq2SeqTrainingArguments(
        output_dir=str(tmp_path), per_device_eval_batch_size=1,
        predict_with_generate=True, generation_max_length=4, save_strategy="no")
    trainer = Seq2SeqTrainer(model, args)
    preds, labels, metrics = trainer.predict(s2s_dataset(8, seed=2))
    assert preds.shape[0] == 8 and labels.shape[0] == 8
    assert "test_loss" in metrics


def test_train_then_generate_eval(tmp_path):
    model = tiny_t5()
    args = Seq2SeqTrainingArguments(
        output_dir=str(tmp_path), per_device_train_batch_size=1,
        per_device_eval_batch_size=1, max_steps=2, learning_rate=1e-3,
        logging_steps=1, save_strategy="no", predict_with_generate=True,
        generation_max_length=4, lr_scheduler_type="constant", seed=0)
    trainer = Seq2SeqTrainer(model, args, train_dataset=s2s_dataset(),
                             eval_dataset=s2s_dataset(8, seed=3))
    trainer.train()
    metrics = trainer.evaluate()
    assert np.isfinite(metrics["eval_loss"])
