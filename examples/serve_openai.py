"""Serve any causal LM with continuous batching + the OpenAI-compatible API
(the analog of reference `transformers serve`):

    python -m transformers_tpu.cli serve /path/to/checkpoint --port 8000
    curl localhost:8000/v1/chat/completions -d '{"messages": [{"role": "user", "content": "hi"}]}'

or programmatically:
"""

import sys

from transformers_tpu.cli.serving import serve

if __name__ == "__main__":
    serve(sys.argv[1] if len(sys.argv) > 1 else "model",
          port=int(sys.argv[2]) if len(sys.argv) > 2 else 8000)
