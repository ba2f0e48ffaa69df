"""RAG config (reference models/rag/configuration_rag.py): a DPR question
encoder + a seq2seq generator + retrieval hyper-parameters."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class


class RagConfig(PretrainedConfig):
    model_type = "rag"
    is_composition = True
    sub_configs = {"question_encoder": "auto", "generator": "auto"}

    def __init__(self, question_encoder=None, generator=None, n_docs=5,
                 max_combined_length=300, retrieval_vector_size=768,
                 retrieval_batch_size=8, dataset="wiki_dpr",
                 dataset_split="train", index_name="compressed",
                 index_path=None, passages_path=None, use_dummy_dataset=False,
                 reduce_loss=False, label_smoothing=0.0, do_deduplication=True,
                 exclude_bos_score=False, do_marginalize=False,
                 output_retrieved=False, use_cache=True,
                 forced_eos_token_id=None, dataset_revision=None, **kwargs):
        if isinstance(question_encoder, dict):
            qtype = question_encoder.pop("model_type", "dpr")
            question_encoder = get_config_class(qtype)(**question_encoder)
        elif question_encoder is None:
            question_encoder = get_config_class("dpr")()
        if isinstance(generator, dict):
            gtype = generator.pop("model_type", "bart")
            generator = get_config_class(gtype)(**generator)
        elif generator is None:
            generator = get_config_class("bart")()
        self.question_encoder = question_encoder
        self.generator = generator
        self.n_docs = n_docs
        self.max_combined_length = max_combined_length
        self.retrieval_vector_size = retrieval_vector_size
        self.retrieval_batch_size = retrieval_batch_size
        self.dataset = dataset
        self.dataset_split = dataset_split
        self.index_name = index_name
        self.index_path = index_path
        self.passages_path = passages_path
        self.use_dummy_dataset = use_dummy_dataset
        self.reduce_loss = reduce_loss
        self.label_smoothing = label_smoothing
        self.do_deduplication = do_deduplication
        self.exclude_bos_score = exclude_bos_score
        self.do_marginalize = do_marginalize
        self.output_retrieved = output_retrieved
        self.dataset_revision = dataset_revision
        kwargs.setdefault("bos_token_id", generator.bos_token_id)
        kwargs.setdefault("pad_token_id", generator.pad_token_id)
        kwargs.setdefault("eos_token_id", generator.eos_token_id)
        kwargs.setdefault("decoder_start_token_id",
                          generator.decoder_start_token_id)
        kwargs.setdefault("is_encoder_decoder", True)
        super().__init__(use_cache=use_cache,
                         forced_eos_token_id=forced_eos_token_id, **kwargs)

    @classmethod
    def from_question_encoder_generator_configs(cls, question_encoder_config,
                                                generator_config, **kwargs):
        return cls(question_encoder=question_encoder_config.to_dict(),
                   generator=generator_config.to_dict(), **kwargs)
