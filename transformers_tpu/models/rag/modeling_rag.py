"""RAG (reference models/rag/modeling_rag.py): retrieval-augmented
generation — a DPR question encoder scores retrieved passages, a seq2seq
generator runs once per (question, document) pair, and the doc posterior is
marginalized either per-token (RAG-token, :1216) or per-sequence
(RAG-sequence, :1028). The retriever here is an in-memory exact dot-product
index (`RagRetriever`) — the reference's faiss/datasets machinery replaced
by a host numpy matmul; hub checkpoints load the same model weights."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..auto.modeling_auto import MODEL_FOR_SEQ_TO_SEQ_CAUSAL_LM_MAPPING_NAMES
from ..dpr.modeling_dpr import DPRQuestionEncoder
from .configuration_rag import RagConfig


@dataclass
class RetrievAugLMMarginOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    doc_scores: Any = None
    past_key_values: Any = None
    retrieved_doc_ids: Any = None
    question_encoder_last_hidden_state: Any = None


def _generator_cls(model_type: str):
    import importlib

    module_name, cls_name = MODEL_FOR_SEQ_TO_SEQ_CAUSAL_LM_MAPPING_NAMES[model_type]
    mod = importlib.import_module(f"transformers_tpu.models.{module_name}")
    return getattr(mod, cls_name)


class RagRetriever:
    """Exact in-memory retriever: doc embeddings [N, D] + tokenized contexts.

    ``contexts`` maps doc index -> (input_ids list). `__call__` returns the
    top-n_docs context ids/masks and their embeddings, mirroring the
    reference RagRetriever surface for the in-model path."""

    def __init__(self, doc_embeds: np.ndarray, context_input_ids: np.ndarray,
                 context_attention_mask: Optional[np.ndarray] = None):
        self.doc_embeds = np.asarray(doc_embeds, np.float32)
        self.context_input_ids = np.asarray(context_input_ids)
        if context_attention_mask is None:
            context_attention_mask = np.ones_like(self.context_input_ids)
        self.context_attention_mask = np.asarray(context_attention_mask)

    def __call__(self, question_hidden_states: np.ndarray, n_docs: int):
        q = np.asarray(question_hidden_states, np.float32)  # [B, D]
        scores = q @ self.doc_embeds.T  # [B, N]
        top = np.argsort(-scores, axis=1)[:, :n_docs]  # [B, n_docs]
        ctx_ids = self.context_input_ids[top].reshape(
            -1, self.context_input_ids.shape[-1])
        ctx_mask = self.context_attention_mask[top].reshape(
            -1, self.context_attention_mask.shape[-1])
        embeds = self.doc_embeds[top]  # [B, n_docs, D]
        return ctx_ids, ctx_mask, embeds, top


class RagPreTrainedModel(PreTrainedModel):
    config_class = RagConfig
    base_model_prefix = ""


class RagModel(PreTrainedModel):
    config_class = RagConfig
    base_model_prefix = ""

    def __init__(self, config: RagConfig, *, dtype=jnp.float32,
                 param_dtype=None, retriever: Optional[RagRetriever] = None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.question_encoder = DPRQuestionEncoder(config.question_encoder, **kw)
        self.generator = _generator_cls(config.generator.model_type)(
            config.generator, **kw)
        self.retriever = retriever

    def retrieve(self, params, input_ids, attention_mask=None, n_docs=None):
        n_docs = n_docs or self.config.n_docs
        q_out = self.question_encoder(params["question_encoder"],
                                      input_ids=input_ids,
                                      attention_mask=attention_mask)
        q_hidden = np.asarray(q_out.pooler_output)
        ctx_ids, ctx_mask, embeds, doc_ids = self.retriever(q_hidden, n_docs)
        doc_scores = jnp.einsum(
            "bd,bnd->bn", jnp.asarray(q_hidden), jnp.asarray(embeds))
        return (jnp.asarray(ctx_ids), jnp.asarray(ctx_mask), doc_scores,
                doc_ids, q_out.pooler_output)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 context_input_ids=None, context_attention_mask=None,
                 doc_scores=None, n_docs=None, **kwargs):
        n_docs = n_docs or self.config.n_docs
        doc_ids = None
        q_hidden = None
        if (context_input_ids is None or doc_scores is None):
            if self.retriever is None:
                raise ValueError(
                    "Provide context_input_ids + doc_scores, or attach a "
                    "RagRetriever.")
            (context_input_ids, context_attention_mask, doc_scores, doc_ids,
             q_hidden) = self.retrieve(params, input_ids, attention_mask,
                                       n_docs)
        if decoder_input_ids is not None:
            decoder_input_ids = jnp.repeat(jnp.asarray(decoder_input_ids),
                                           n_docs, axis=0)
        if decoder_attention_mask is not None:
            decoder_attention_mask = jnp.repeat(
                jnp.asarray(decoder_attention_mask), n_docs, axis=0)
        gen_out = self.generator(
            params["generator"], input_ids=context_input_ids,
            attention_mask=context_attention_mask,
            decoder_input_ids=decoder_input_ids,
            decoder_attention_mask=decoder_attention_mask)
        return gen_out, doc_scores, doc_ids, q_hidden


class _RagForGenerationBase(RagPreTrainedModel):
    def __init__(self, config: RagConfig, *, dtype=jnp.float32,
                 param_dtype=None, retriever: Optional[RagRetriever] = None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rag = RagModel(config, dtype=self.dtype,
                            param_dtype=self.param_dtype, retriever=retriever)

    def set_retriever(self, retriever: RagRetriever):
        self.rag.retriever = retriever

    @staticmethod
    def _shift_left(target, pad_id):
        return jnp.concatenate(
            [target[:, 1:], jnp.full((target.shape[0], 1), pad_id,
                                     target.dtype)], axis=1)


class RagTokenForGeneration(_RagForGenerationBase):
    """reference :1102 — per-token marginalization over docs."""

    def marginalize(self, seq_logits, doc_scores, n_docs=None):
        n_docs = n_docs or self.config.n_docs
        b = seq_logits.shape[0] // n_docs
        seq_logprobs = jax.nn.log_softmax(seq_logits, axis=-1).reshape(
            b, n_docs, seq_logits.shape[1], seq_logits.shape[2])
        doc_logprobs = jax.nn.log_softmax(doc_scores, axis=1)
        return jax.nn.logsumexp(
            seq_logprobs + doc_logprobs[:, :, None, None], axis=1)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 context_input_ids=None, context_attention_mask=None,
                 doc_scores=None, labels=None, n_docs=None,
                 reduce_loss=None, do_marginalize=None,
                 **kwargs) -> RetrievAugLMMarginOutput:
        n_docs = n_docs or self.config.n_docs
        do_marginalize = (do_marginalize if do_marginalize is not None
                          else self.config.do_marginalize)
        if labels is not None and decoder_input_ids is None:
            decoder_input_ids = labels
        gen_out, doc_scores, doc_ids, q_hidden = self.rag(
            params["rag"], input_ids, attention_mask, decoder_input_ids,
            decoder_attention_mask, context_input_ids,
            context_attention_mask, doc_scores, n_docs)
        logits = gen_out.logits
        loss = None
        if labels is not None:
            loss = self._nll(self.marginalize(logits, doc_scores, n_docs),
                             jnp.asarray(labels),
                             reduce_loss if reduce_loss is not None
                             else self.config.reduce_loss)
        if do_marginalize:
            logits = self.marginalize(logits, doc_scores, n_docs)
        return RetrievAugLMMarginOutput(
            loss=loss, logits=logits, doc_scores=doc_scores,
            retrieved_doc_ids=doc_ids,
            question_encoder_last_hidden_state=q_hidden)

    def _nll(self, rag_logprobs, target, reduce_loss, epsilon=None):
        epsilon = epsilon if epsilon is not None else self.config.label_smoothing
        pad_id = self.config.generator.pad_token_id
        target = self._shift_left(target, pad_id)
        ll = jnp.take_along_axis(rag_logprobs, target[..., None], axis=-1)[..., 0]
        smooth = rag_logprobs.sum(-1)
        pad_mask = target == pad_id
        ll = jnp.where(pad_mask, 0.0, ll).sum(1)
        smooth = jnp.where(pad_mask, 0.0, smooth).sum(1)
        nll, smooth_loss = -ll, -smooth
        if reduce_loss:
            nll, smooth_loss = nll.sum(), smooth_loss.sum()
        eps_i = epsilon / rag_logprobs.shape[-1]
        return (1.0 - epsilon) * nll + eps_i * smooth_loss


class RagSequenceForGeneration(_RagForGenerationBase):
    """reference :663 — per-sequence marginalization (doc posterior applied
    once, at the second token)."""

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 context_input_ids=None, context_attention_mask=None,
                 doc_scores=None, labels=None, n_docs=None, reduce_loss=None,
                 exclude_bos_score=None, **kwargs) -> RetrievAugLMMarginOutput:
        n_docs = n_docs or self.config.n_docs
        if labels is not None and decoder_input_ids is None:
            decoder_input_ids = labels
        gen_out, doc_scores, doc_ids, q_hidden = self.rag(
            params["rag"], input_ids, attention_mask, decoder_input_ids,
            decoder_attention_mask, context_input_ids,
            context_attention_mask, doc_scores, n_docs)
        loss = None
        if labels is not None:
            loss = self._nll(
                gen_out.logits, doc_scores, jnp.asarray(labels),
                reduce_loss if reduce_loss is not None
                else self.config.reduce_loss,
                exclude_bos_score if exclude_bos_score is not None
                else self.config.exclude_bos_score, n_docs)
        return RetrievAugLMMarginOutput(
            loss=loss, logits=gen_out.logits, doc_scores=doc_scores,
            retrieved_doc_ids=doc_ids,
            question_encoder_last_hidden_state=q_hidden)

    def _nll(self, seq_logits, doc_scores, target, reduce_loss,
             exclude_bos_score, n_docs, epsilon=None):
        epsilon = epsilon if epsilon is not None else self.config.label_smoothing
        pad_id = self.config.generator.pad_token_id
        target = self._shift_left(target, pad_id)
        bos_id = self.config.bos_token_id or self.config.generator.bos_token_id
        use_bos = bos_id is not None and bool((target[:, 0] == bos_id).all())
        b = seq_logits.shape[0] // n_docs
        seq_logprobs = jax.nn.log_softmax(seq_logits, axis=-1).reshape(
            b, n_docs, seq_logits.shape[1], -1)
        doc_logprobs = jax.nn.log_softmax(doc_scores, axis=1)[:, :, None, None]
        rag_logprobs = jnp.concatenate([
            seq_logprobs[:, :, :1],
            seq_logprobs[:, :, 1:2] + doc_logprobs,
            seq_logprobs[:, :, 2:]], axis=2)
        tgt = jnp.broadcast_to(target[:, None, :, None],
                               (b, n_docs, target.shape[1], 1))
        ll = jnp.take_along_axis(rag_logprobs, tgt, axis=-1)[..., 0]
        smooth = rag_logprobs.sum(-1)
        pad_mask = jnp.broadcast_to(target[:, None, :] == pad_id, ll.shape)
        ll = jnp.where(pad_mask, 0.0, ll)
        smooth = jnp.where(pad_mask, 0.0, smooth)
        ll = ll[:, :, 1:].sum(2) if (exclude_bos_score and use_bos) else ll.sum(2)
        smooth = smooth.sum(2)
        ll = jax.nn.logsumexp(ll, axis=1)
        smooth = jax.nn.logsumexp(smooth, axis=1)
        nll, smooth_loss = -ll, -smooth
        if reduce_loss:
            nll, smooth_loss = nll.sum(), smooth_loss.sum()
        eps_i = epsilon / rag_logprobs.shape[-1]
        return (1.0 - epsilon) * nll + eps_i * smooth_loss
