"""Minimal metadata-filesystem seam for the lake's control plane.

Everything the table format and the CDC engine do to METADATA (snapshot
manifests, VERSION pointers, commit manifests, checkpoints, landing stats)
goes through this module, so a deployment against an object store swaps one
adapter instead of chasing ``open``/``os.replace`` calls through the engine.
Data files are read/written by Spark itself and already work on any
Hadoop-compatible filesystem.

The local adapter commits pointers with ``os.replace`` (atomic on POSIX).
An S3-style adapter must replace that single primitive with a
conditional-PUT (If-None-Match / If-Match on the pointer object's ETag) or a
pointer row in a transactional store — the same design space as Iceberg's
catalog vs HadoopTableOperations. Only ``replace_text`` carries that
atomicity contract; every other call here is plain read/write/list.

Path portability is separate and handled by the manifests themselves: data
file paths are stored RELATIVE to the table root (see LakeTable), so a
warehouse directory can be relocated or mirrored to another store and opened
unchanged.
"""

from __future__ import annotations

import json
import os
import uuid


def read_text(path: str) -> str:
    with open(path) as f:
        return f.read()


def write_text(path: str, text: str) -> None:
    with open(path, "w") as f:
        f.write(text)


def replace_text(path: str, text: str) -> None:
    """Atomically publish ``text`` at ``path`` (the pointer-swap primitive —
    the ONLY call with an atomicity contract; see module docstring)."""
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def read_json(path: str) -> dict:
    return json.loads(read_text(path))


def write_json_atomic(path: str, obj: dict) -> None:
    replace_text(path, json.dumps(obj))


def listdir(path: str) -> list[str]:
    return os.listdir(path)


def exists(path: str) -> bool:
    return os.path.exists(path)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def remove(path: str) -> None:
    os.remove(path)


def rmtree(path: str) -> None:
    """Recursively delete a directory tree (missing path is a no-op) —
    operator scratch space (barrier files) shares this seam with the table
    metadata so an object-store adapter swaps ONE module, not call sites."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
