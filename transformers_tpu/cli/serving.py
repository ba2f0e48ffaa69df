"""OpenAI-compatible serving on aiohttp.

TPU-native analog of reference cli/serve.py:41 + cli/serving/server.py:44
(FastAPI there; aiohttp here — same endpoints and SSE wire format):
``/v1/models``, ``/v1/chat/completions``, ``/v1/completions`` with
``stream=true`` SSE backed by the continuous-batching manager, and
``/v1/audio/transcriptions`` (reference cli/serving ASR route) backed by a
speech seq2seq model (Whisper) with stdlib WAV decoding.
"""

from __future__ import annotations

import asyncio
import json
import time
import queue as queue_mod
import uuid
from typing import Optional

from ..generation.continuous_batching import ContinuousBatchingManager, RequestState
from ..utils import logging
from .serving_utils import (ModelManager, get_response_template,
                            normalize_tool_call, parse_assistant_message)

logger = logging.get_logger(__name__)


class ServeEngine:
    """Model + tokenizer + CB manager bundle."""

    def __init__(self, model, tokenizer, model_name: str = "model", **engine_kwargs):
        self.model = model
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.response_template = get_response_template(tokenizer, model)
        self.manager = ContinuousBatchingManager(model, **engine_kwargs)
        self.manager.start()

    def close(self):
        self.manager.stop()

    def _eos_ids(self) -> tuple:
        eos = getattr(self.model.config, "eos_token_id", None)
        if eos is None and self.tokenizer is not None:
            eos = self.tokenizer.eos_token_id
        if eos is None:
            return ()
        return tuple(eos) if isinstance(eos, (list, tuple)) else (int(eos),)

    def submit_ids(self, prompt_ids: list[int], *, max_new_tokens: int,
                   temperature: float, seed: int = 0):
        req = RequestState(
            request_id=f"cmpl-{uuid.uuid4().hex[:20]}", prompt_ids=list(map(int, prompt_ids)),
            max_new_tokens=max_new_tokens, eos_token_ids=self._eos_ids(),
            temperature=temperature, seed=seed)
        return req.request_id, self.manager.submit(req)

    def chat_prompt_ids(self, messages: list[dict]) -> list[int]:
        if self.tokenizer.chat_template is not None:
            return self.tokenizer.apply_chat_template(messages, add_generation_prompt=True)
        text = "\n".join(f"{m['role']}: {m['content']}" for m in messages) + "\nassistant:"
        return self.tokenizer.encode(text)


def decode_wav(data: bytes, target_rate: int = 16000):
    """Decode a WAV payload to mono float32 at ``target_rate`` using only the
    stdlib (the reference shells out to librosa/torchcodec — SURVEY 2.2 audio
    decode; PCM16/PCM32/float WAV covers the API surface)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        audio = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        audio = np.frombuffer(frames, np.int32).astype(np.float32) / 2147483648.0
    else:
        audio = np.frombuffer(frames, np.uint8).astype(np.float32) / 128.0 - 1.0
    if n_channels > 1:
        audio = audio.reshape(-1, n_channels).mean(axis=1)
    if rate != target_rate:
        n_out = int(len(audio) * target_rate / rate)
        x_old = np.linspace(0.0, 1.0, num=len(audio), endpoint=False)
        x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
        audio = np.interp(x_new, x_old, audio).astype(np.float32)
    return audio


class AudioEngine:
    """Whisper-style speech seq2seq bundle for /v1/audio/transcriptions."""

    def __init__(self, model, tokenizer, feature_extractor, model_name: str = "whisper"):
        self.model = model
        self.tokenizer = tokenizer
        self.feature_extractor = feature_extractor
        self.model_name = model_name

    @classmethod
    def from_pretrained(cls, path: str):
        from ..models.auto import AutoModelForSpeechSeq2Seq
        from ..models.whisper import WhisperFeatureExtractor
        from ..tokenization import AutoTokenizer

        model = cls.__new__(cls)
        model.model = AutoModelForSpeechSeq2Seq.from_pretrained(path)
        model.tokenizer = AutoTokenizer.from_pretrained(path)
        try:
            model.feature_extractor = WhisperFeatureExtractor.from_pretrained(path)
        except Exception:
            model.feature_extractor = WhisperFeatureExtractor()
        model.model_name = path
        return model

    def transcribe(self, audio, max_new_tokens: int = 128) -> str:
        import numpy as np

        feats = self.feature_extractor([np.asarray(audio, np.float32)], return_tensors="jax")
        out = self.model.generate(self.model.params,
                                  input_features=feats["input_features"],
                                  max_new_tokens=max_new_tokens)
        tokens = np.asarray(out)[0]
        return self.tokenizer.decode(list(map(int, tokens)), skip_special_tokens=True)


class _StreamParser:
    """Turns raw token-id growth into OpenAI chunk deltas. With a response
    template, text is routed through a streaming :class:`ResponseParser` so
    tool calls and reasoning stream as structured deltas; without one, plain
    ``delta.content`` text."""

    def __init__(self, eng: ServeEngine, prompt_ids: list[int]):
        self.eng = eng
        self.parser = None
        self.sent = ""  # raw text already fed/emitted
        self.calls = 0
        if eng.response_template is not None:
            from ..utils.chat_parsing import ResponseParser
            prefix = eng.tokenizer.decode(list(map(int, prompt_ids)),
                                          skip_special_tokens=False)
            try:
                self.parser = ResponseParser(eng.response_template, prefix=prefix)
            except Exception as e:
                logger.warning(f"stream parser init failed ({e}); raw streaming")

    def _grow(self, all_ids, *, specials: bool) -> str:
        text = self.eng.tokenizer.decode(list(map(int, all_ids)),
                                         skip_special_tokens=not specials)
        if text.endswith("�"):  # hold back a partial UTF-8 codepoint
            return ""
        delta, self.sent = text[len(self.sent):], text
        return delta

    def _events_to_deltas(self, events) -> list[dict]:
        deltas = []
        for ev in events:
            if ev["type"] == "region_chunk" and not ev.get("dirty"):
                if ev["field"] == "content":
                    deltas.append({"content": ev["text"]})
                elif ev["field"] == "thinking":
                    deltas.append({"reasoning_content": ev["text"]})
            elif ev["type"] == "region_close" and ev["field"] == "tool_calls":
                call = normalize_tool_call(ev["value"])
                deltas.append({"tool_calls": [call.as_openai(self.calls)]})
                self.calls += 1
        return deltas

    def step(self, all_ids) -> list[dict]:
        if self.parser is None:
            d = self._grow(all_ids, specials=False)
            return [{"content": d}] if d else []
        return self._events_to_deltas(self.parser.feed(self._grow(all_ids, specials=True)))

    def finish(self) -> list[dict]:
        if self.parser is None:
            return []
        try:
            _, events = self.parser.finalize()
        except Exception as e:
            logger.warning(f"stream parse finalize failed: {e}")
            return []
        return self._events_to_deltas(events)


def build_app(engine: ServeEngine, audio_engine: Optional[AudioEngine] = None,
              manager: Optional[ModelManager] = None,
              max_concurrency: int = 64,
              request_timeout: Optional[float] = None):
    """Server hardening (reference cli/serving/server.py:44):

    - **cancellation**: a client disconnect mid-stream cancels the CB
      request, freeing its blocks immediately;
    - **timeout**: ``request_timeout`` seconds per request, after which the
      request is cancelled and 504 returned (or the stream closed);
    - **backpressure**: at most ``max_concurrency`` in-flight generation
      requests; excess gets 429 with Retry-After.
    """
    from aiohttp import web

    app = web.Application()
    inflight = {"n": 0}

    def _admit() -> bool:
        if inflight["n"] >= max_concurrency:
            return False
        inflight["n"] += 1
        return True

    def _release():
        inflight["n"] = max(0, inflight["n"] - 1)

    def _too_busy():
        return web.json_response(
            {"error": {"message": "server overloaded, retry later",
                       "type": "rate_limit_exceeded"}},
            status=429, headers={"Retry-After": "1"})

    def resolve_engine(body: dict) -> ServeEngine:
        """Serve the preloaded model by default; with a ModelManager, load
        whatever model the request names (reference model_manager.py)."""
        name = body.get("model")
        if manager is not None and name and name != engine.model_name:
            return manager.get(name)
        return engine

    async def models(request):
        names = [engine.model_name] + [n for n in (manager.loaded() if manager else [])
                                       if n != engine.model_name]
        return web.json_response({
            "object": "list",
            "data": [{"id": n, "object": "model", "owned_by": "transformers_tpu",
                      "created": int(time.time())} for n in names],
        })

    async def _collect(q, loop, eng=None, rid=None, deadline=None):
        """Drain the CB delivery queue without blocking the event loop.

        Enforces the per-request deadline: on expiry the CB request is
        cancelled and asyncio.TimeoutError raised. Generator cleanup (client
        disconnect closes the handler) also cancels the request."""
        import functools

        try:
            while True:
                if deadline is not None:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        raise asyncio.TimeoutError
                    try:
                        ev = await loop.run_in_executor(
                            None, functools.partial(q.get, timeout=remaining))
                    except queue_mod.Empty:
                        raise asyncio.TimeoutError from None
                else:
                    ev = await loop.run_in_executor(None, q.get)
                yield ev
                if ev.status in ("finished", "failed", "cancelled"):
                    return
        except (asyncio.TimeoutError, GeneratorExit, asyncio.CancelledError):
            if eng is not None and rid is not None:
                eng.manager.cancel(rid)
            raise

    async def chat_completions(request):
        if not _admit():
            return _too_busy()
        try:
            return await _chat_completions(request)
        finally:
            _release()

    async def _chat_completions(request):
        body = await request.json()
        eng = resolve_engine(body)
        messages = body.get("messages", [])
        stream = bool(body.get("stream", False))
        max_new = int(body.get("max_tokens") or body.get("max_completion_tokens") or 128)
        temperature = float(body.get("temperature", 1.0) or 0.0)
        if not body.get("do_sample", True) or temperature == 0.0:
            temperature = 0.0
        prompt_ids = eng.chat_prompt_ids(messages)
        rid, q = eng.submit_ids(prompt_ids, max_new_tokens=max_new, temperature=temperature)
        created = int(time.time())
        loop = asyncio.get_event_loop()
        deadline = (time.monotonic() + request_timeout) if request_timeout else None

        if not stream:
            final = None
            try:
                async for ev in _collect(q, loop, eng, rid, deadline):
                    final = ev
            except asyncio.TimeoutError:
                return web.json_response(
                    {"error": {"message": "request timed out", "type": "timeout"}},
                    status=504)
            if final.status == "failed":
                return web.json_response({"error": {"message": final.error or "failed"}}, status=500)
            text = eng.tokenizer.decode(final.generated_ids, skip_special_tokens=True)
            content, reasoning, tool_calls = parse_assistant_message(
                eng.tokenizer, eng.model, final.generated_ids, prompt_ids, text)
            message = {"role": "assistant", "content": content}
            if reasoning is not None:
                message["reasoning_content"] = reasoning
            if tool_calls:
                message["tool_calls"] = [c.as_openai(i) for i, c in enumerate(tool_calls)]
            return web.json_response({
                "id": rid, "object": "chat.completion", "created": created,
                "model": eng.model_name,
                "choices": [{"index": 0, "message": message,
                             "finish_reason": "tool_calls" if tool_calls else "stop"}],
                "usage": {"prompt_tokens": len(prompt_ids),
                          "completion_tokens": len(final.generated_ids),
                          "total_tokens": len(prompt_ids) + len(final.generated_ids)},
            })

        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream",
                                           "Cache-Control": "no-cache"})
        await resp.prepare(request)
        sp = _StreamParser(eng, prompt_ids)
        saw_calls = False

        async def send(delta, finish=None):
            chunk = {"id": rid, "object": "chat.completion.chunk", "created": created,
                     "model": eng.model_name,
                     "choices": [{"index": 0, "delta": delta, "finish_reason": finish}]}
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())

        try:
            async for ev in _collect(q, loop, eng, rid, deadline):
                if ev.status == "failed":
                    await send({}, finish="error")
                    break
                for delta in sp.step(ev.generated_ids):
                    saw_calls = saw_calls or "tool_calls" in delta
                    await send(delta)
                if ev.status == "finished":
                    for delta in sp.finish():
                        saw_calls = saw_calls or "tool_calls" in delta
                        await send(delta)
                    await send({}, finish="tool_calls" if saw_calls else "stop")
        except asyncio.TimeoutError:
            await send({}, finish="timeout")
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def responses_api(request):
        if not _admit():
            return _too_busy()
        try:
            return await _responses_api(request)
        finally:
            _release()

    async def _responses_api(request):
        """OpenAI Responses API (reference cli/serving/response.py): accepts
        ``input`` as a string or message list; streams typed
        ``response.*`` SSE events or returns one response object."""
        body = await request.json()
        eng = resolve_engine(body)
        raw_input = body.get("input", "")
        if isinstance(raw_input, str):
            messages = [{"role": "user", "content": raw_input}]
        else:
            messages = [{"role": m.get("role", "user"),
                         "content": m.get("content", "")} for m in raw_input]
        if body.get("instructions"):
            messages.insert(0, {"role": "system", "content": body["instructions"]})
        stream = bool(body.get("stream", False))
        max_new = int(body.get("max_output_tokens") or 128)
        temperature = float(body.get("temperature", 1.0) or 0.0)
        prompt_ids = eng.chat_prompt_ids(messages)
        rid = f"resp_{uuid.uuid4().hex[:20]}"
        _, q = eng.submit_ids(prompt_ids, max_new_tokens=max_new, temperature=temperature)
        created = int(time.time())
        loop = asyncio.get_event_loop()
        deadline = (time.monotonic() + request_timeout) if request_timeout else None

        def response_obj(status, output_text, n_out):
            message = {"id": f"msg_{rid[5:]}", "type": "message", "role": "assistant",
                       "status": "completed" if status == "completed" else "in_progress",
                       "content": [{"type": "output_text", "text": output_text,
                                    "annotations": []}]}
            return {"id": rid, "object": "response", "created_at": created,
                    "status": status, "model": eng.model_name, "output": [message],
                    "usage": {"input_tokens": len(prompt_ids), "output_tokens": n_out,
                              "total_tokens": len(prompt_ids) + n_out}}

        if not stream:
            final = None
            try:
                async for ev in _collect(q, loop, eng, rid, deadline):
                    final = ev
            except asyncio.TimeoutError:
                return web.json_response(
                    {"error": {"message": "request timed out", "type": "timeout"}},
                    status=504)
            if final.status == "failed":
                return web.json_response({"error": {"message": final.error or "failed"}},
                                         status=500)
            text = eng.tokenizer.decode(final.generated_ids, skip_special_tokens=True)
            return web.json_response(response_obj("completed", text,
                                                  len(final.generated_ids)))

        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream",
                                           "Cache-Control": "no-cache"})
        await resp.prepare(request)
        seq = 0

        async def emit(etype, **payload):
            nonlocal seq
            seq += 1
            data = {"type": etype, "sequence_number": seq, **payload}
            await resp.write(f"event: {etype}\ndata: {json.dumps(data)}\n\n".encode())

        await emit("response.created", response=response_obj("in_progress", "", 0))
        sp = _StreamParser(eng, prompt_ids)
        sp.parser = None  # responses API streams raw output_text deltas
        text = ""
        n_out = 0
        failed = False
        try:
            async for ev in _collect(q, loop, eng, rid, deadline):
                if ev.status == "failed":
                    failed = True
                    await emit("response.failed",
                               response=response_obj("failed", text, n_out))
                    break
                n_out = len(ev.generated_ids)
                for delta in sp.step(ev.generated_ids):
                    text += delta["content"]
                    await emit("response.output_text.delta", item_id=f"msg_{rid[5:]}",
                               output_index=0, content_index=0, delta=delta["content"])
        except asyncio.TimeoutError:
            failed = True
            await emit("response.failed",
                       response=response_obj("failed", text, n_out))
        if not failed:
            await emit("response.output_text.done", item_id=f"msg_{rid[5:]}",
                       output_index=0, content_index=0, text=text)
            await emit("response.completed",
                       response=response_obj("completed", text, n_out))
        await resp.write_eof()
        return resp

    async def completions(request):
        if not _admit():
            return _too_busy()
        try:
            return await _completions(request)
        finally:
            _release()

    async def _completions(request):
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt = prompt[0]
        max_new = int(body.get("max_tokens", 16))
        temperature = float(body.get("temperature", 1.0) or 0.0)
        prompt_ids = engine.tokenizer.encode(prompt)
        rid, q = engine.submit_ids(prompt_ids, max_new_tokens=max_new, temperature=temperature)
        loop = asyncio.get_event_loop()
        deadline = (time.monotonic() + request_timeout) if request_timeout else None
        final = None
        try:
            async for ev in _collect(q, loop, engine, rid, deadline):
                final = ev
        except asyncio.TimeoutError:
            return web.json_response(
                {"error": {"message": "request timed out", "type": "timeout"}},
                status=504)
        if final.status == "failed":
            return web.json_response({"error": {"message": final.error or "failed"}}, status=500)
        text = engine.tokenizer.decode(final.generated_ids, skip_special_tokens=True)
        return web.json_response({
            "id": rid, "object": "text_completion", "created": int(time.time()),
            "model": engine.model_name,
            "choices": [{"index": 0, "text": text, "finish_reason": "stop"}],
        })

    async def health(request):
        return web.json_response({"status": "ok"})

    async def audio_transcriptions(request):
        if not _admit():
            return _too_busy()
        try:
            return await _audio_transcriptions(request)
        finally:
            _release()

    async def _audio_transcriptions(request):
        if audio_engine is None:
            return web.json_response(
                {"error": "no transcription model loaded (pass --transcription-model)"},
                status=400)
        post = await request.post()
        upload = post.get("file")
        if upload is None:
            return web.json_response({"error": "missing 'file' field"}, status=400)
        data = upload.file.read()
        loop = asyncio.get_event_loop()
        audio = decode_wav(data)
        text = await loop.run_in_executor(None, audio_engine.transcribe, audio)
        return web.json_response({"text": text})

    app.router.add_post("/v1/audio/transcriptions", audio_transcriptions)
    app.router.add_get("/v1/models", models)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/responses", responses_api)
    app.router.add_get("/health", health)
    return app


def serve(model_path: str, host: str = "127.0.0.1", port: int = 8000,
          transcription_model: Optional[str] = None,
          max_concurrency: int = 64, request_timeout: Optional[float] = None,
          **engine_kwargs):
    """Entry: load model+tokenizer, run the server (reference `transformers serve`)."""
    from aiohttp import web

    from ..models.auto import AutoModelForCausalLM
    from ..tokenization import AutoTokenizer

    logger.info(f"Loading {model_path}")
    model = AutoModelForCausalLM.from_pretrained(model_path)
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    engine = ServeEngine(model, tokenizer, model_name=model_path, **engine_kwargs)
    audio_engine = AudioEngine.from_pretrained(transcription_model) if transcription_model else None
    app = build_app(engine, audio_engine, max_concurrency=max_concurrency,
                    request_timeout=request_timeout)
    try:
        web.run_app(app, host=host, port=port)
    finally:
        engine.close()
