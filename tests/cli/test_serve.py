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


def _make_wav(path, rate=16000, n=1600):
    import wave

    t = np.linspace(0, 1, n)
    pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def test_decode_wav_roundtrip(tmp_path):
    from transformers_tpu.cli.serving import decode_wav

    p = str(tmp_path / "t.wav")
    _make_wav(p)
    audio = decode_wav(open(p, "rb").read())
    assert audio.shape == (1600,) and abs(float(np.abs(audio).max()) - 20000 / 32768) < 1e-3
    # resample 8k -> 16k doubles the length
    _make_wav(p, rate=8000, n=800)
    audio = decode_wav(open(p, "rb").read())
    assert audio.shape == (1600,)


def test_audio_transcriptions_endpoint(tmp_path):
    """Spin an app with a tiny whisper AudioEngine and POST a wav."""
    import io
    import urllib.request

    import torch
    import transformers as hf

    torch.manual_seed(0)
    cfg = hf.WhisperConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=3,
        suppress_tokens=[], begin_suppress_tokens=[], forced_decoder_ids=None)
    d = str(tmp_path / "whisper")
    hf.WhisperForConditionalGeneration(cfg).eval().save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d, vocab_size=64)

    from aiohttp import web

    from transformers_tpu.cli.serving import AudioEngine, ServeEngine, build_app
    from transformers_tpu.models.whisper import WhisperFeatureExtractor

    model = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    tokenizer = ttpu.AutoTokenizer.from_pretrained(d)
    audio_engine = AudioEngine(model, tokenizer, WhisperFeatureExtractor())

    # lm engine reuses the existing tiny llama fixture assets
    lm_dir = str(tmp_path / "lm")
    make_tiny_torch_llama(lm_dir, num_hidden_layers=2)
    make_tiny_tokenizer(lm_dir)
    lm = ttpu.AutoModelForCausalLM.from_pretrained(lm_dir, dtype="float32")
    lm_tok = ttpu.AutoTokenizer.from_pretrained(lm_dir)
    engine = ServeEngine(lm, lm_tok, num_blocks=16, block_size=4, token_budget=8)
    app = build_app(engine, audio_engine)

    import asyncio

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    async def start():
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 8733)
        await site.start()

    t = threading.Thread(target=lambda: (asyncio.set_event_loop(loop),
                                         loop.run_until_complete(start()),
                                         loop.run_forever()), daemon=True)
    t.start()
    time.sleep(1.0)
    try:
        wav_path = str(tmp_path / "a.wav")
        _make_wav(wav_path)
        boundary = "xBOUNDARYx"
        body = io.BytesIO()
        body.write(f"--{boundary}\r\n".encode())
        body.write(b'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n')
        body.write(b"Content-Type: audio/wav\r\n\r\n")
        body.write(open(wav_path, "rb").read())
        body.write(f"\r\n--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            "http://127.0.0.1:8733/v1/audio/transcriptions", data=body.getvalue(),
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=180) as r:
            out = json.loads(r.read())
        assert "text" in out and isinstance(out["text"], str)
    finally:
        loop.call_soon_threadsafe(loop.stop)
        engine.close()
