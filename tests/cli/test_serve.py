"""OpenAI-compatible server e2e: /v1/models, chat completions (+stream)."""

import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import make_tiny_torch_llama  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def make_tiny_tokenizer(save_dir: str, vocab_size=99):
    """Byte-level BPE over single bytes via the Rust tokenizers lib (test
    fixture only — our own engine consumes the resulting tokenizer.json)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    from transformers_tpu.tokenization.engine import bytes_to_unicode

    byte_chars = list(bytes_to_unicode().values())
    vocab = {"<s>": 1, "</s>": 2}
    for i, c in enumerate(byte_chars):
        if len(vocab) >= vocab_size:
            break
        vocab[c] = len(vocab) + 1 if c not in vocab else vocab[c]
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2}
    for c in byte_chars:
        if len(vocab) >= vocab_size:
            break
        vocab[c] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(str(Path(save_dir) / "tokenizer.json"))
    with open(Path(save_dir) / "tokenizer_config.json", "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>", "pad_token": "<pad>",
                   "chat_template": "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n{% endfor %}{% if add_generation_prompt %}assistant:{% endif %}"}, f)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve"))
    make_tiny_torch_llama(d, num_hidden_layers=2)
    make_tiny_tokenizer(d)

    from aiohttp import web

    from transformers_tpu.cli.serving import ServeEngine, build_app

    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    tokenizer = ttpu.AutoTokenizer.from_pretrained(d)
    engine = ServeEngine(model, tokenizer, model_name="tiny", num_blocks=64,
                         block_size=4, token_budget=8)
    app = build_app(engine)

    import asyncio

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    async def start():
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 8731)
        await site.start()

    t = threading.Thread(target=lambda: (asyncio.set_event_loop(loop),
                                         loop.run_until_complete(start()),
                                         loop.run_forever()), daemon=True)
    t.start()
    time.sleep(1.0)
    yield "http://127.0.0.1:8731"
    loop.call_soon_threadsafe(loop.stop)
    engine.close()


def _post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_models_endpoint(served):
    with urllib.request.urlopen(served + "/v1/models", timeout=30) as r:
        data = json.loads(r.read())
    assert data["data"][0]["id"] == "tiny"


def test_chat_completion(served):
    out = _post(served + "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 6, "temperature": 0,
        "messages": [{"role": "user", "content": "hi"}],
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["usage"]["completion_tokens"] >= 1
    assert isinstance(out["choices"][0]["message"]["content"], str)


def test_chat_completion_stream(served):
    req = urllib.request.Request(
        served + "/v1/chat/completions",
        data=json.dumps({"model": "tiny", "max_tokens": 6, "temperature": 0, "stream": True,
                         "messages": [{"role": "user", "content": "hello"}]}).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                chunks.append(json.loads(payload))
    assert chunks, "no SSE chunks"
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"


def test_completions_endpoint(served):
    out = _post(served + "/v1/completions", {"model": "tiny", "prompt": "abc", "max_tokens": 4,
                                             "temperature": 0})
    assert out["object"] == "text_completion"
    assert isinstance(out["choices"][0]["text"], str)
