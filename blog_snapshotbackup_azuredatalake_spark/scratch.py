"""Scratch-dir helper for demo/lifecycle operators.

Streaming checkpoints and the IO-lifecycle demos (snapshot txn-log,
vacuum, copy-roundtrip) create short-lived scratch stores. On a local
bench box those are pure fixed cost — checkpoint dirs are small-file-
and-fsync-heavy — so scratch space goes to tmpfs (/dev/shm) when one
is writable; only the backing medium changes, never the file layout or
the plan. A real deployment points streaming checkpoints at durable
shared storage instead (they must survive driver loss) and backup
stores at the lake — both are constructor/argument-level choices in
the operators that use this helper.
"""

from __future__ import annotations

import os
import tempfile


def scratch_dir(prefix: str) -> str:
    """mkdtemp on tmpfs when available, else the default temp dir."""
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)
