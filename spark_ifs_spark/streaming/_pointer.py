"""The pointer-commit primitive shared by every maintained-index
streaming module (``ann``, ``minhash``, ``profile``): a single
``current.json`` written via atomic ``os.replace`` is the ONLY commit
point, carrying whatever snapshot state the module pairs together
(version directory, append watermark, parameters). Readers resolve the
pointer once and derive everything from that one snapshot; writers
write data first and swing the pointer last, so a crash in between
leaves only orphan directories that no reader can see.

Extracted here so a durability change (fsync-before-replace, a schema
version check) lands in one place instead of drifting across three
copies.
"""

from __future__ import annotations

import json
import os


def _pointer_path(path: str) -> str:
    return os.path.join(path.rstrip("/"), "current.json")


def _read_state(path: str) -> dict | None:
    p = _pointer_path(path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _commit_state(path: str, state: dict) -> None:
    p = _pointer_path(path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)  # atomic on POSIX — the one commit point
