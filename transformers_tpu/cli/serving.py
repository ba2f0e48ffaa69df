"""OpenAI-compatible serving on aiohttp.

TPU-native analog of reference cli/serve.py:41 + cli/serving/server.py:44
(FastAPI there; aiohttp here — same endpoints and SSE wire format):
``/v1/models``, ``/v1/chat/completions``, ``/v1/completions`` with
``stream=true`` SSE, backed by the continuous-batching manager.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Optional

from ..generation.continuous_batching import ContinuousBatchingManager, RequestState
from ..utils import logging

logger = logging.get_logger(__name__)


class ServeEngine:
    """Model + tokenizer + CB manager bundle."""

    def __init__(self, model, tokenizer, model_name: str = "model", **engine_kwargs):
        self.model = model
        self.tokenizer = tokenizer
        self.model_name = model_name
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


def build_app(engine: ServeEngine):
    from aiohttp import web

    app = web.Application()

    async def models(request):
        return web.json_response({
            "object": "list",
            "data": [{"id": engine.model_name, "object": "model", "owned_by": "transformers_tpu",
                      "created": int(time.time())}],
        })

    async def _collect(q, loop):
        """Drain the CB delivery queue without blocking the event loop."""
        while True:
            ev = await loop.run_in_executor(None, q.get)
            yield ev
            if ev.status in ("finished", "failed"):
                return

    def _decode_delta(prev_text: str, all_ids: list[int]) -> tuple[str, str]:
        text = engine.tokenizer.decode(all_ids, skip_special_tokens=True)
        if text.endswith("�"):
            return prev_text, ""
        return text, text[len(prev_text):]

    async def chat_completions(request):
        body = await request.json()
        messages = body.get("messages", [])
        stream = bool(body.get("stream", False))
        max_new = int(body.get("max_tokens") or body.get("max_completion_tokens") or 128)
        temperature = float(body.get("temperature", 1.0) or 0.0)
        if not body.get("do_sample", True) or temperature == 0.0:
            temperature = 0.0
        prompt_ids = engine.chat_prompt_ids(messages)
        rid, q = engine.submit_ids(prompt_ids, max_new_tokens=max_new, temperature=temperature)
        created = int(time.time())
        loop = asyncio.get_event_loop()

        if not stream:
            final = None
            async for ev in _collect(q, loop):
                final = ev
            if final.status == "failed":
                return web.json_response({"error": {"message": final.error or "failed"}}, status=500)
            text = engine.tokenizer.decode(final.generated_ids, skip_special_tokens=True)
            return web.json_response({
                "id": rid, "object": "chat.completion", "created": created,
                "model": engine.model_name,
                "choices": [{"index": 0, "message": {"role": "assistant", "content": text},
                             "finish_reason": "stop"}],
                "usage": {"prompt_tokens": len(prompt_ids),
                          "completion_tokens": len(final.generated_ids),
                          "total_tokens": len(prompt_ids) + len(final.generated_ids)},
            })

        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream",
                                           "Cache-Control": "no-cache"})
        await resp.prepare(request)
        sent_text = ""
        async for ev in _collect(q, loop):
            if ev.status == "failed":
                chunk = {"id": rid, "object": "chat.completion.chunk", "created": created,
                         "model": engine.model_name,
                         "choices": [{"index": 0, "delta": {}, "finish_reason": "error"}]}
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                break
            sent_text, delta = _decode_delta(sent_text, ev.generated_ids)
            if delta or ev.status == "finished":
                chunk = {"id": rid, "object": "chat.completion.chunk", "created": created,
                         "model": engine.model_name,
                         "choices": [{"index": 0,
                                      "delta": ({"content": delta} if delta else {}),
                                      "finish_reason": "stop" if ev.status == "finished" else None}]}
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def completions(request):
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt = prompt[0]
        max_new = int(body.get("max_tokens", 16))
        temperature = float(body.get("temperature", 1.0) or 0.0)
        prompt_ids = engine.tokenizer.encode(prompt)
        rid, q = engine.submit_ids(prompt_ids, max_new_tokens=max_new, temperature=temperature)
        loop = asyncio.get_event_loop()
        final = None
        async for ev in _collect(q, loop):
            final = ev
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

    app.router.add_get("/v1/models", models)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/completions", completions)
    app.router.add_get("/health", health)
    return app


def serve(model_path: str, host: str = "127.0.0.1", port: int = 8000, **engine_kwargs):
    """Entry: load model+tokenizer, run the server (reference `transformers serve`)."""
    from aiohttp import web

    from ..models.auto import AutoModelForCausalLM
    from ..tokenization import AutoTokenizer

    logger.info(f"Loading {model_path}")
    model = AutoModelForCausalLM.from_pretrained(model_path)
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    engine = ServeEngine(model, tokenizer, model_name=model_path, **engine_kwargs)
    app = build_app(engine)
    try:
        web.run_app(app, host=host, port=port)
    finally:
        engine.close()
