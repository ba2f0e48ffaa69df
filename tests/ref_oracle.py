"""Run the reference source tree (/root/reference/src, v5.15-dev) as a torch
oracle in a SUBPROCESS.

The installed ``transformers`` wheel is v4.57 and lacks many families this
repo implements (Parakeet, Qwen2.5-Omni, Grounding-DINO, ...). The reference
source imports cleanly against the installed huggingface_hub after four tiny
API-drift shims — but it cannot coexist with the installed wheel in one
process (both are ``transformers`` in sys.modules), so oracle snippets run in
a child interpreter and hand results back through an .npz file.

Usage:
    out = reference_run('''
    from transformers import ParakeetForCTC, ParakeetCTCConfig
    m = ParakeetForCTC(ParakeetCTCConfig(...)).eval()
    ...
    outputs = {"logits": logits}          # dict[str, torch.Tensor|ndarray]
    state_dict_dir = "/tmp/..."           # optional: save_pretrained target
    ''')
    out["logits"]  # numpy array
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
import textwrap
from pathlib import Path

import numpy as np

PREAMBLE = """
import sys
import importlib.metadata as _md
_real_version = _md.version
_md.version = lambda n: "1.5.0" if n in ("huggingface-hub", "huggingface_hub") else _real_version(n)
import huggingface_hub as _hh
import huggingface_hub.constants as _hc
if not hasattr(_hh, "is_offline_mode"):
    _hh.is_offline_mode = lambda: bool(getattr(_hc, "HF_HUB_OFFLINE", False))
import huggingface_hub.dataclasses as _hd
if not hasattr(_hd, "validate_typed_dict"):
    _hd.validate_typed_dict = lambda *a, **k: None
_tv = _hd.type_validator
def _lenient_tv(name, value, expected_type):
    try:
        return _tv(name, value, expected_type)
    except TypeError as e:
        if "Unsupported type" in str(e):
            return None  # hub 0.36 can't validate PEP 604 unions; skip
        raise
_hd.type_validator = _lenient_tv
sys.path.insert(0, "/root/reference/src")
import torch
torch.manual_seed(0)
"""

EPILOGUE = """
import numpy as _np
_arrs = {}
for _k, _v in outputs.items():
    if hasattr(_v, "detach"):
        _v = _v.detach().to(torch.float32).cpu().numpy()
    _arrs[_k] = _np.asarray(_v)
_np.savez(sys.argv[1], **_arrs)
"""


def reference_run(snippet: str, timeout: int = 600) -> dict:
    """Execute ``snippet`` against the reference source; return its ``outputs``
    dict as numpy arrays. Raises on nonzero exit with the child's stderr."""
    with tempfile.TemporaryDirectory() as td:
        script = Path(td) / "oracle.py"
        out = Path(td) / "out.npz"
        script.write_text(PREAMBLE + textwrap.dedent(snippet) + EPILOGUE)
        proc = subprocess.run([sys.executable, str(script), str(out)],
                              capture_output=True, text=True, timeout=timeout)
        if proc.returncode != 0:
            raise RuntimeError(f"reference oracle failed:\n{proc.stderr[-4000:]}")
        data = np.load(out)
        return {k: data[k] for k in data.files}
