"""PreTrainedModel base + attention registry.

TPU-native analog of reference src/transformers/modeling_utils.py:1181
(``PreTrainedModel``): config binding, ``from_pretrained``/``save_pretrained``
against hub safetensors checkpoints, weight tying, dtype plans, and the
pluggable attention-kernel registry (reference modeling_utils.py:5093-5131
``AttentionInterface``/``ALL_ATTENTION_FUNCTIONS``).

A model here is a stateless :class:`~transformers_tpu.core.module.Module`
whose ``__call__(params, ...)`` is pure (jit/pjit-safe); loaded params live on
``model.params`` for convenience APIs (generate, pipelines) but every compute
path threads them explicitly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .configuration_utils import PretrainedConfig
from .core.loading import (
    LoadReport,
    load_checkpoint_in_model,
    materialize_missing,
    resolve_checkpoint_files,
    save_params_as_safetensors,
)
from .core.module import Module
from .utils import logging
from .utils.generic import flatten_dict

logger = logging.get_logger(__name__)

_STR_TO_DTYPE = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float64": jnp.float64,
    "fp32": jnp.float32,
    "fp16": jnp.float16,
    "bf16": jnp.bfloat16,
}


def dtype_from_str(dtype) -> Any:
    if dtype is None:
        return None
    if isinstance(dtype, str):
        return _STR_TO_DTYPE.get(dtype.replace("torch.", ""), None)
    return dtype


class PreTrainedModel(Module):
    """Base for all models.

    Subclass contract:
    - ``config_class``: the matching PretrainedConfig subclass
    - ``base_model_prefix``: name of the bare-transformer child (e.g. "model")
    - ``_tied_weights_keys``: param paths tied to the input embedding
    - ``__init__(config, dtype=..., param_dtype=...)`` builds the child tree
    - ``__call__(params, ...)`` pure forward
    """

    config_class: type[PretrainedConfig] = PretrainedConfig
    base_model_prefix: str = ""
    main_input_name: str = "input_ids"
    _tied_weights_keys: tuple[str, ...] = ()
    _weight_rules: tuple = ()
    # Checkpoint keys that are expected to be absent from the param tree
    # (e.g. tied decoder duplicates) — regexes filtered from the load report
    # (reference modeling_utils.py _keys_to_ignore_on_load_unexpected).
    _keys_to_ignore_on_load_unexpected: tuple[str, ...] = ()
    # Missing keys whose module init IS the reference value (frozen sinusoid
    # position tables): materialized silently, not reported.
    _keys_to_ignore_on_load_missing: tuple[str, ...] = ()
    # Declarative parallelism plan (regex -> PartitionSpec-vocabulary string),
    # the reference's per-model ``_tp_plan`` (models/llama/modeling_llama.py:424).
    _tp_plan: dict[str, str] = {}

    def __init__(self, config: PretrainedConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(dtype=dtype, param_dtype=param_dtype or dtype)
        self.config = config
        self.params: Optional[dict] = None
        self.generation_config = None

    # ------------------------------------------------------------------ tying
    @property
    def tied_weights_keys(self) -> tuple[str, ...]:
        if getattr(self.config, "tie_word_embeddings", False):
            return self._tied_weights_keys
        return ()

    def tie_weights(self, params: dict) -> dict:
        """Point tied leaves at the embedding table (reference modeling_utils.py:2607).

        In a functional pytree, tying = sharing the same Array object; jit
        deduplicates identical leaves by value, and save_pretrained drops the
        tied keys entirely.
        """
        if not self.tied_weights_keys:
            return params
        src = self.get_input_embedding_path()
        if src is None:
            return params
        from .utils.generic import get_nested, set_nested

        try:
            src_val = get_nested(params, src)
        except KeyError:
            return params
        for key in self.tied_weights_keys:
            set_nested(params, key, src_val)
        return params

    def get_input_embedding_path(self) -> Optional[str]:
        """Dot-path of the input embedding table. Subclasses override."""
        return None

    # --------------------------------------------------------- decode layouts
    def decode_param_formats(self, batch_size: int, total_len: int, dtype=None):
        """XLA-preferred on-device layouts for every parameter in the
        single-token decode program.

        Decode matmuls (M = batch) prefer transposed tilings for some weight
        shapes; feeding default-layout params makes XLA materialize
        program-lifetime transposed copies (~2 GB at Llama-3-8B scale, enough
        to OOM next to the full parameter set). Compiling a one-step decode
        probe with AUTO input layouts recovers the preferred formats; params
        placed in those formats make every jitted program (generate, serving)
        copy-free. Returns a pytree of ``jax.experimental.layout.Format``
        matching ``init_abstract()``.
        """
        from jax.experimental.layout import Format, Layout

        dtype = dtype or self.dtype
        spec = self.init_abstract()
        b = batch_size

        def probe(params, cache, tok):
            out = self(params, input_ids=tok,
                       attention_mask=jnp.ones((b, total_len), jnp.int32),
                       position_ids=jnp.zeros((b, 1), jnp.int32),
                       past_key_values=cache, cache_position=total_len - 1,
                       logits_to_keep=1)
            return jnp.argmax(out.logits[:, -1], axis=-1)

        cache_spec = jax.eval_shape(
            lambda: self.init_cache(b, total_len, dtype=dtype))
        tok = jax.ShapeDtypeStruct((b, 1), jnp.int32)
        auto = Format(Layout.AUTO)
        compiled = jax.jit(
            probe, in_shardings=(jax.tree.map(lambda s: auto, spec), None, None),
        ).lower(spec, cache_spec, tok).compile()
        return compiled.input_formats[0][0]

    def materialize_zero_params(self, formats):
        """Zero parameters created directly in the given layout ``formats``
        pytree (benchmark-scale trees: no f32 init temporaries, no
        post-creation layout copies). Each leaf's layout is VERIFIED — the
        persistent compile cache has been observed returning a stale
        zeros-program executable whose output layouts ignore
        ``out_shardings`` — and mismatches repaired with an on-device
        ``device_put`` relayout (one leaf at a time above the param
        footprint)."""
        import jax.numpy as jnp

        spec = self.init_abstract()
        mk = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), spec),
                     out_shardings=formats)
        params = mk()
        flat, treedef = jax.tree_util.tree_flatten(params)
        flat_fmt = jax.tree_util.tree_flatten(
            formats, is_leaf=lambda x: hasattr(x, "layout"))[0]
        out, fixed = [], 0
        for leaf, fmt in zip(flat, flat_fmt):
            if leaf.format.layout != fmt.layout:
                new = jax.device_put(leaf, fmt)
                jax.block_until_ready(new)
                leaf.delete()
                leaf, fixed = new, fixed + 1
            out.append(leaf)
        if fixed:
            logger.info(f"materialize_zero_params: relaid out {fixed} stale-layout leaves")
        return jax.tree_util.tree_unflatten(treedef, out)

    def relayout_params_for_decode(self, params, batch_size: int, total_len: int):
        """Re-place ``params`` into decode-preferred layouts leaf by leaf
        (see ``decode_param_formats``). The input tree is consumed — leaves
        are deleted as they are copied so peak memory stays ~one leaf above
        the parameter footprint."""
        formats = self.decode_param_formats(batch_size, total_len)
        flat_params, treedef = jax.tree_util.tree_flatten(params)
        flat_formats = jax.tree_util.tree_flatten(
            formats, is_leaf=lambda x: hasattr(x, "layout"))[0]
        out = []
        for leaf, fmt in zip(flat_params, flat_formats):
            new = jax.device_put(leaf, fmt)
            jax.block_until_ready(new)
            if new is not leaf:
                leaf.delete()
            out.append(new)
        return jax.tree_util.tree_unflatten(treedef, out)

    # ------------------------------------------------------------------- init
    def init_params(self, seed: int = 0) -> dict:
        rng = jax.random.key(seed)
        params = self.init(rng)
        return self.tie_weights(params)

    def num_parameters(self, params: Optional[dict] = None) -> int:
        params = params if params is not None else self.params
        flat = flatten_dict(params)
        ids = set()
        total = 0
        for v in flat.values():
            if id(v) in ids:
                continue
            ids.add(id(v))
            total += v.size
        return total

    # --------------------------------------------------------------------- IO
    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path,
        *,
        config: Optional[PretrainedConfig] = None,
        dtype: Any = "auto",
        param_dtype: Any = None,
        shardings: Optional[dict] = None,
        device: Optional[jax.Device] = None,
        attn_implementation: Optional[str] = None,
        quantization_config=None,
        gguf_file: Optional[str] = None,
        seed: int = 0,
        **config_kwargs,
    ) -> "PreTrainedModel":
        """Load config + weights from a hub-layout directory/repo.

        Reference parity: modeling_utils.py:3859 ``from_pretrained`` — steps
        1 (config), 4 (checkpoint resolution), 5 (dtype), 7 (model build),
        12 (streamed load + shard placement), tie_weights, generation config.
        ``gguf_file`` loads dequantized llama.cpp checkpoints (reference
        modeling_gguf_pytorch_utils.py ``load_gguf_checkpoint``).
        """
        gguf_ckpt = None
        if gguf_file is not None:
            from .modeling_gguf_utils import gguf_config_kwargs, load_gguf_checkpoint
            from .utils.hub import cached_file

            gguf_path = cached_file(str(pretrained_model_name_or_path), gguf_file)
            gguf_ckpt = load_gguf_checkpoint(gguf_path)
            if config is None:
                kwargs = gguf_config_kwargs(gguf_ckpt["metadata"])
                kwargs.pop("model_type", None)
                kwargs.update(config_kwargs)
                try:
                    config = cls.config_class.from_pretrained(
                        pretrained_model_name_or_path, **kwargs
                    )
                except OSError:  # GGUF-only directory: config from metadata alone
                    config = cls.config_class(**kwargs)
        if config is None:
            config = cls.config_class.from_pretrained(pretrained_model_name_or_path, **config_kwargs)
        if attn_implementation is not None:
            config.attn_implementation = attn_implementation

        ckpt_dtype = dtype_from_str(getattr(config, "dtype", None))
        if dtype == "auto":
            load_dtype = ckpt_dtype or jnp.float32
        else:
            load_dtype = dtype_from_str(dtype) or jnp.float32

        model = cls(config, dtype=load_dtype, param_dtype=dtype_from_str(param_dtype) or load_dtype)

        if gguf_ckpt is not None:
            checkpoint_files = [gguf_ckpt["tensors"]]
        else:
            checkpoint_files, _ = resolve_checkpoint_files(str(pretrained_model_name_or_path))
        # Pre-quantized hub checkpoints (GPTQ/AWQ/compressed-tensors/fp8):
        # dequantize-on-load into the plain param tree (reference quantizers/).
        config_qdict = getattr(config, "quantization_config", None)
        if isinstance(config_qdict, dict) and config_qdict:
            from .quantizers.checkpoint_formats import (
                detect_prequantized,
                load_prequantized_checkpoint,
            )

            if detect_prequantized(config_qdict) is not None:
                checkpoint_files = [
                    load_prequantized_checkpoint(checkpoint_files, config_qdict)
                ]
        params, report = load_checkpoint_in_model(
            model,
            checkpoint_files,
            dtype=model.param_dtype,
            shardings=shardings,
            device=device,
            keep_in_fp32_patterns=getattr(cls, "_keep_in_fp32_patterns", ()),
        )
        ignore_unexpected = getattr(model, "_keys_to_ignore_on_load_unexpected", ())
        if ignore_unexpected:
            import re

            report.unexpected_keys = [
                k for k in report.unexpected_keys
                if not any(re.search(p, k) for p in ignore_unexpected)
            ]
        # Tied weights resolve missing keys before random materialization.
        params = model.tie_weights(params)
        still_missing = [k for k in report.missing_keys if k not in flatten_dict(params)]
        tied = set(report.missing_keys) - set(still_missing)
        report.missing_keys = still_missing
        if still_missing:
            params = materialize_missing(model, params, still_missing, jax.random.key(seed))
            params = model.tie_weights(params)
        # Keys whose init IS the correct value (frozen sinusoid tables etc.):
        # materialized above, not reported (reference
        # _keys_to_ignore_on_load_missing).
        ignore_missing = getattr(model, "_keys_to_ignore_on_load_missing", ())
        if ignore_missing:
            import re

            report.missing_keys = [
                k for k in report.missing_keys
                if not any(re.search(p, k) for p in ignore_missing)
            ]
        report.log(cls.__name__)
        if quantization_config is not None:
            from .quantizers import quantize_params

            params = quantize_params(model, params, quantization_config)
        model.params = params
        model.load_report = report

        # Generation config (reference :4351-4366)
        try:
            from .generation.configuration_utils import GenerationConfig

            gen_path = None
            from .utils.hub import GENERATION_CONFIG_NAME, cached_file

            gen_path = cached_file(
                str(pretrained_model_name_or_path), GENERATION_CONFIG_NAME,
                _raise_exceptions_for_missing_entries=False,
            )
            if gen_path is not None:
                model.generation_config = GenerationConfig.from_json_file(gen_path)
            else:
                model.generation_config = GenerationConfig.from_model_config(config)
        except ImportError:
            pass
        return model

    def save_pretrained(self, save_directory, params: Optional[dict] = None, **kwargs) -> None:
        params = params if params is not None else self.params
        self.config.architectures = [type(self).__name__.replace("TPU", "")]
        self.config.save_pretrained(save_directory)
        if self.generation_config is not None:
            self.generation_config.save_pretrained(save_directory)
        save_params_as_safetensors(
            self, params, str(save_directory), tied_keys=self.tied_weights_keys,
        )

    # ------------------------------------------------------------ conveniences
    def parallelize(self, params: dict, mesh, plan: Optional[dict] = None) -> dict:
        """Apply a tp/fsdp plan: re-place params with NamedShardings on ``mesh``."""
        from .parallel.plans import shard_params_with_plan

        plan = plan if plan is not None else self._tp_plan
        return shard_params_with_plan(params, self, mesh, plan)
