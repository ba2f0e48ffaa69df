"""CLI (reference src/transformers/cli/): `python -m transformers_tpu.cli serve ...`."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser("transformers_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    serve_p = sub.add_parser("serve", help="OpenAI-compatible server (continuous batching)")
    serve_p.add_argument("model", help="model path or repo")
    serve_p.add_argument("--host", default="127.0.0.1")
    serve_p.add_argument("--port", type=int, default=8000)
    serve_p.add_argument("--num-blocks", type=int, default=512)
    serve_p.add_argument("--block-size", type=int, default=32)
    serve_p.add_argument("--max-batch", type=int, default=32)
    serve_p.add_argument("--token-budget", type=int, default=128)
    serve_p.add_argument("--transcription-model", default=None,
                         help="Whisper-style model for /v1/audio/transcriptions")

    chat_p = sub.add_parser("chat", help="terminal chat client")
    chat_p.add_argument("target", help="model path, or http(s) URL of a serve endpoint")
    chat_p.add_argument("--max-new-tokens", type=int, default=256)

    args = parser.parse_args(argv)
    if args.command == "chat":
        from .chat import chat_local, chat_over_http

        if args.target.startswith("http"):
            chat_over_http(args.target)
        else:
            chat_local(args.target, max_new_tokens=args.max_new_tokens)
        return
    if args.command == "serve":
        from .serving import serve

        serve(args.model, host=args.host, port=args.port, num_blocks=args.num_blocks,
              block_size=args.block_size, max_batch=args.max_batch,
              token_budget=args.token_budget,
              transcription_model=args.transcription_model)


if __name__ == "__main__":
    main()
