"""Terminal chat client (reference src/transformers/cli/chat.py:682 LoC
`transformers chat`): talks to a serve endpoint or runs a local model."""

from __future__ import annotations

import json
import sys
import urllib.request
from typing import Optional


def chat_over_http(url: str, model_name: str = "model"):
    """Chat against an OpenAI-compatible endpoint (ours or anyone's)."""
    messages: list[dict] = []
    print(f"chatting with {url} — 'exit' to quit, 'clear' to reset")
    while True:
        try:
            user = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if user in ("exit", "quit"):
            break
        if user == "clear":
            messages = []
            continue
        if not user:
            continue
        messages.append({"role": "user", "content": user})
        req = urllib.request.Request(
            url.rstrip("/") + "/v1/chat/completions",
            data=json.dumps({"model": model_name, "messages": messages,
                             "max_tokens": 256, "temperature": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        reply = out["choices"][0]["message"]["content"]
        print(reply)
        messages.append({"role": "assistant", "content": reply})


def chat_local(model_path: str, max_new_tokens: int = 256):
    """In-process chat (loads the model directly)."""
    import jax.numpy as jnp

    from ..models.auto import AutoModelForCausalLM
    from ..tokenization import AutoTokenizer

    model = AutoModelForCausalLM.from_pretrained(model_path)
    tok = AutoTokenizer.from_pretrained(model_path)
    messages: list[dict] = []
    print(f"chatting with {model_path} — 'exit' to quit, 'clear' to reset")
    while True:
        try:
            user = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if user in ("exit", "quit"):
            break
        if user == "clear":
            messages = []
            continue
        if not user:
            continue
        messages.append({"role": "user", "content": user})
        ids = tok.apply_chat_template(messages, add_generation_prompt=True)
        out = model.generate(model.params, input_ids=jnp.asarray([ids]),
                             max_new_tokens=max_new_tokens)
        text = tok.decode([int(t) for t in out[0][len(ids):]], skip_special_tokens=True)
        print(text)
        messages.append({"role": "assistant", "content": text})
