"""Streaming decode path: streamer callbacks, stop strings, max-time."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.generation.stopping_criteria import MaxTimeCriteria  # noqa: E402
from transformers_tpu.generation.streamers import BaseStreamer  # noqa: E402


class CollectStreamer(BaseStreamer):
    def __init__(self):
        self.chunks = []
        self.ended = False

    def put(self, value):
        self.chunks.append(np.asarray(value))

    def end(self):
        self.ended = True


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    make_tiny_torch_llama(d, num_hidden_layers=2)
    return d


def test_streaming_matches_jitted_path(tiny):
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    jitted = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                       max_new_tokens=8, prompt_pad_multiple=4))
    streamer = CollectStreamer()
    streamed = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                         max_new_tokens=8, prompt_pad_multiple=4,
                                         streamer=streamer))
    assert streamer.ended
    n = streamed.shape[1]
    np.testing.assert_array_equal(streamed[0], jitted[0, :n])
    # prompt chunk + one chunk per generated token
    toks = np.concatenate([c.reshape(-1) for c in streamer.chunks[1:]])
    np.testing.assert_array_equal(toks, streamed[0, 4:])


def test_stop_strings(tiny):
    class FakeTokenizer:
        def decode(self, ids, **kw):
            return "".join(chr(97 + (t % 26)) for t in ids)

    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    tok = FakeTokenizer()
    full = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                     max_new_tokens=8, prompt_pad_multiple=4,
                                     streamer=CollectStreamer()))
    # stop at the text of the first generated token
    first_char = tok.decode([int(full[0, 4])])
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=8, prompt_pad_multiple=4,
                                    stop_strings=[first_char], tokenizer=tok))
    assert out.shape[1] == 5  # stopped right after the first generated token


def test_max_time_criteria(tiny):
    model = ttpu.AutoModelForCausalLM.from_pretrained(tiny, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    crit = MaxTimeCriteria(max_time=0.0)  # expires immediately
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=8, prompt_pad_multiple=4,
                                    stopping_criteria=[crit]))
    assert out.shape[1] == 5
