"""Benchmark harness.

TPU-native analog of reference benchmark_v2/framework/benchmark_runner.py
(:238-313 per-token event timing) + data_classes.py:96-116 (TTFT/ITL/e2e
metrics). Measures generate end-to-end, prefill (TTFT) and per-token decode
(ITL) on the current backend, with roofline context from the model geometry.
"""

from __future__ import annotations

import statistics
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BenchmarkResult:
    """reference data_classes.py BenchmarkMetrics."""

    name: str
    e2e_latency_s: float
    ttft_s: float
    itl_s: float
    tokens_per_sec: float
    batch_size: int
    prompt_len: int
    new_tokens: int
    runs: int
    device: str
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)


class BenchmarkRunner:
    def __init__(self, model, params=None, warmup: int = 2, runs: int = 5):
        self.model = model
        self.params = params if params is not None else model.params
        self.warmup = warmup
        self.runs = runs

    def _time(self, fn) -> list[float]:
        for _ in range(self.warmup):
            fn()
        times = []
        for _ in range(self.runs):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return times

    def benchmark_generate(self, *, batch_size: int = 1, prompt_len: int = 128,
                           new_tokens: int = 128, name: str = "generate") -> BenchmarkResult:
        rng = np.random.default_rng(0)
        vocab = self.model.config.get_text_config().vocab_size
        ids = jnp.asarray(rng.integers(1, vocab, size=(batch_size, prompt_len)), jnp.int32)

        def run_full():
            out = self.model.generate(self.params, input_ids=ids, max_new_tokens=new_tokens,
                                      do_sample=False, prompt_pad_multiple=prompt_len,
                                      eos_token_id=-1)
            return np.asarray(jax.block_until_ready(out))

        def run_one():
            out = self.model.generate(self.params, input_ids=ids, max_new_tokens=1,
                                      do_sample=False, prompt_pad_multiple=prompt_len,
                                      eos_token_id=-1)
            return np.asarray(jax.block_until_ready(out))

        e2e = statistics.median(self._time(run_full))
        ttft = statistics.median(self._time(run_one))
        itl = (e2e - ttft) / max(new_tokens - 1, 1)
        return BenchmarkResult(
            name=name, e2e_latency_s=e2e, ttft_s=ttft, itl_s=itl,
            tokens_per_sec=batch_size * new_tokens / e2e,
            batch_size=batch_size, prompt_len=prompt_len, new_tokens=new_tokens,
            runs=self.runs, device=jax.devices()[0].platform,
        )

    def benchmark_forward(self, example_inputs: dict, *, name: str = "forward") -> BenchmarkResult:
        def run():
            out = self.model(self.params, **example_inputs)
            return jax.block_until_ready(out.logits if out.logits is not None
                                         else out.last_hidden_state)

        times = self._time(run)
        e2e = statistics.median(times)
        first = next(iter(example_inputs.values()))
        b = first.shape[0]
        return BenchmarkResult(
            name=name, e2e_latency_s=e2e, ttft_s=e2e, itl_s=0.0,
            tokens_per_sec=b / e2e, batch_size=b,
            prompt_len=first.shape[1] if first.ndim > 1 else 0, new_tokens=0,
            runs=self.runs, device=jax.devices()[0].platform,
        )
