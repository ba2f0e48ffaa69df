"""Checkpoint file resolution: local dirs, HF cache, (optional) hub download.

TPU-native analog of reference src/transformers/utils/hub.py:238 (``cached_file``),
:298 (``cached_files``), :851 (``get_checkpoint_shard_files``). This build is
offline-first: a model id resolves against (1) a local path, (2) the standard
huggingface cache layout under ``HF_HOME``, (3) ``huggingface_hub`` download when
the environment allows network access.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from . import logging

logger = logging.get_logger(__name__)

# Hub file-name contract (reference src/transformers/utils/__init__.py:279-290).
CONFIG_NAME = "config.json"
GENERATION_CONFIG_NAME = "generation_config.json"
SAFE_WEIGHTS_NAME = "model.safetensors"
SAFE_WEIGHTS_INDEX_NAME = "model.safetensors.index.json"
WEIGHTS_NAME = "pytorch_model.bin"
WEIGHTS_INDEX_NAME = "pytorch_model.bin.index.json"
TOKENIZER_FILE = "tokenizer.json"
TOKENIZER_CONFIG_FILE = "tokenizer_config.json"
SPECIAL_TOKENS_MAP_FILE = "special_tokens_map.json"
IMAGE_PROCESSOR_NAME = "preprocessor_config.json"
FEATURE_EXTRACTOR_NAME = "preprocessor_config.json"
VIDEO_PROCESSOR_NAME = "video_preprocessor_config.json"
PROCESSOR_NAME = "processor_config.json"
CHAT_TEMPLATE_FILE = "chat_template.jinja"


def _hf_cache_dir() -> str:
    hf_home = os.environ.get("HF_HOME", os.path.join(os.path.expanduser("~"), ".cache", "huggingface"))
    return os.environ.get("HF_HUB_CACHE", os.path.join(hf_home, "hub"))


def _cached_repo_dir(repo_id: str) -> Optional[str]:
    """Find a snapshot dir for repo_id in the standard HF cache layout."""
    repo_dir = os.path.join(_hf_cache_dir(), "models--" + repo_id.replace("/", "--"))
    snapshots = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(snapshots):
        return None
    # Prefer the snapshot pointed at by a ref, else the most recent.
    refs = os.path.join(repo_dir, "refs", "main")
    if os.path.isfile(refs):
        with open(refs) as f:
            rev = f.read().strip()
        cand = os.path.join(snapshots, rev)
        if os.path.isdir(cand):
            return cand
    entries = sorted(
        (os.path.join(snapshots, e) for e in os.listdir(snapshots)),
        key=os.path.getmtime,
        reverse=True,
    )
    return entries[0] if entries else None


def is_offline() -> bool:
    return os.environ.get("HF_HUB_OFFLINE", "0") == "1" or os.environ.get("TRANSFORMERS_TPU_OFFLINE", "0") == "1"


def cached_file(
    path_or_repo_id: str,
    filename: str,
    *,
    revision: Optional[str] = None,
    _raise_exceptions_for_missing_entries: bool = True,
    **kwargs,
) -> Optional[str]:
    """Resolve ``filename`` within a local dir, the HF cache, or the hub.

    Reference parity: utils/hub.py:238 ``cached_file``.
    """
    path_or_repo_id = str(path_or_repo_id)
    if os.path.isdir(path_or_repo_id):
        full = os.path.join(path_or_repo_id, filename)
        if os.path.isfile(full):
            return full
        if _raise_exceptions_for_missing_entries:
            raise OSError(f"{path_or_repo_id} does not contain a file named {filename}.")
        return None

    snapshot = _cached_repo_dir(path_or_repo_id)
    if snapshot is not None:
        full = os.path.join(snapshot, filename)
        if os.path.isfile(full):
            return full

    if not is_offline():
        try:
            from huggingface_hub import hf_hub_download

            return hf_hub_download(path_or_repo_id, filename, revision=revision)
        except Exception as e:  # noqa: BLE001 — network/permission errors degrade to miss
            logger.debug(f"hub download failed for {path_or_repo_id}/{filename}: {e}")

    if _raise_exceptions_for_missing_entries:
        raise OSError(
            f"Could not resolve {filename} for {path_or_repo_id!r}: not a local directory, "
            f"not in the HF cache ({_hf_cache_dir()}), and hub download unavailable."
        )
    return None


def cached_files(path_or_repo_id: str, filenames: list[str], **kwargs) -> list[Optional[str]]:
    return [cached_file(path_or_repo_id, f, **kwargs) for f in filenames]


def has_file(path_or_repo_id: str, filename: str, **kwargs) -> bool:
    return cached_file(path_or_repo_id, filename, _raise_exceptions_for_missing_entries=False) is not None


def get_checkpoint_shard_files(path_or_repo_id: str, index_filename: str, **kwargs) -> tuple[list[str], dict]:
    """Resolve all shards named by a safetensors index file.

    Reference parity: utils/hub.py:851 ``get_checkpoint_shard_files``.
    Returns (shard_paths, sharded_metadata) where sharded_metadata carries the
    ``weight_map`` (param name -> shard file).
    """
    index_path = cached_file(path_or_repo_id, index_filename)
    with open(index_path) as f:
        index = json.load(f)
    shard_names = sorted(set(index["weight_map"].values()))
    shard_paths = [cached_file(path_or_repo_id, name) for name in shard_names]
    sharded_metadata = {
        "weight_map": index["weight_map"],
        "metadata": index.get("metadata", {}),
        "all_checkpoint_keys": list(index["weight_map"].keys()),
    }
    return shard_paths, sharded_metadata
