"""Transactional commit log for the backup store (SURVEY.md §2A).

A Delta-Lake-style ordered log of JSON commit files under
``<backup_root>/_txn_log/``::

    00000000000000000000.json   one commit: header line + action lines
    00000000000000000001.json
    ...

Each commit is staged to a temp file and published with ``os.link`` —
an atomic create-if-absent on POSIX (and on the HDFS/ABFS rename
semantics this models), so exactly ONE writer can own a version number.
A concurrent writer that loses the race either retries at the next
version (blind append) or raises ``CommitConflict`` when the caller
pinned ``read_version`` (optimistic concurrency: the caller must re-read
state before retrying, because its snapshot of the store is stale).

Readers reconstruct the live file-set at any version by folding
add/remove actions in order — that's point-in-time *metadata* time
travel, complementing ``SnapshotManager.restore`` which time-travels the
*data*. The log is the audit trail the reference keeps as backup
manifests: which snapshot dirs exist, when each appeared, what removed
them.
"""

from __future__ import annotations

import json
import os
import tempfile


class CommitConflict(Exception):
    """Another writer committed the version this writer built against."""


class TransactionLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_txn_log")

    def _path(self, version: int) -> str:
        return os.path.join(self.dir, f"{version:020d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.dir)
            if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # -- write ------------------------------------------------------------
    def commit(
        self,
        op: str,
        actions: list[dict],
        read_version: int | None = None,
    ) -> int:
        """Append one commit; returns its version. ``read_version`` pins
        the optimistic base: if someone else committed after it, raise
        CommitConflict instead of silently interleaving."""
        os.makedirs(self.dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(json.dumps({"op": op}) + "\n")
                for a in actions:
                    f.write(json.dumps(a) + "\n")
            while True:
                latest = self.latest_version()
                if read_version is not None and (latest or -1) > read_version:
                    raise CommitConflict(
                        f"read at v{read_version}, but log is at v{latest}"
                    )
                target = (latest + 1) if latest is not None else 0
                try:
                    os.link(tmp, self._path(target))  # atomic claim
                    return target
                except FileExistsError:
                    if read_version is not None:
                        raise CommitConflict(
                            f"lost the race for v{target}"
                        ) from None
                    # blind append: retry at the next version
        finally:
            os.unlink(tmp)

    # -- read -------------------------------------------------------------
    def read_commit(self, version: int) -> tuple[dict, list[dict]]:
        with open(self._path(version)) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        return lines[0], lines[1:]

    def state(self, as_of: int | None = None) -> dict[str, dict]:
        """Live path → add-metadata after folding the log up to and
        including ``as_of`` (default: everything)."""
        live: dict[str, dict] = {}
        for v in self.versions():
            if as_of is not None and v > as_of:
                break
            _, actions = self.read_commit(v)
            for a in actions:
                if "add" in a:
                    live[a["add"]["path"]] = {**a["add"], "version": v}
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
        return live

    def history(self) -> list[dict]:
        """One record per commit: version, op, action counts."""
        out = []
        for v in self.versions():
            header, actions = self.read_commit(v)
            out.append(
                {
                    "version": v,
                    "op": header["op"],
                    "n_add": sum(1 for a in actions if "add" in a),
                    "n_remove": sum(1 for a in actions if "remove" in a),
                }
            )
        return out
