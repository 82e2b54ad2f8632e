"""No-concurrent-measurement guard — round-7 verdict item 6.

Round 7 lost both sf60 watch-item A/Bs to contamination because a
verify drive was launched while the suite tail was still running; the
burned-in rule ("never time anything while another Spark JVM is
alive") lived only in prose. This makes it executable: every scale
runner calls :func:`assert_no_spark_jvm` at startup and either refuses
to start (default) or loudly tags its output (``allow_tag=True`` /
SPARK_GRAFT_GUARD=tag) so a contaminated number can never be mistaken
for a clean one.
"""
from __future__ import annotations

import os
import subprocess
import sys


def _live_spark_jvms() -> list[str]:
    """Other live Spark driver JVMs, one ``pid cmdline-head`` per line.

    Matches java processes whose command line mentions spark — the
    signature of a pyspark local-mode driver (this box never runs
    non-Spark java). Excludes nothing else: the caller runs BEFORE
    creating its own session, so any hit is a foreign JVM.
    """
    try:
        out = subprocess.run(
            ["pgrep", "-fa", "java"], capture_output=True, text=True
        ).stdout
    except OSError:
        return []
    hits = []
    for line in out.splitlines():
        low = line.lower()
        if "spark" in low and "pgrep" not in low:
            hits.append(line[:160])
    return hits


def assert_no_spark_jvm(allow_tag: bool = False) -> bool:
    """Refuse to start (or tag) when another Spark JVM is alive.

    Returns True when the environment is clean, False when tagged dirty
    (only reachable with allow_tag / SPARK_GRAFT_GUARD=tag). On a dirty
    refusal, exits 3 so suite wrappers fail loudly rather than record a
    contaminated number.

    A short grace poll distinguishes a DYING JVM from a concurrent one:
    back-to-back fresh-session runs in a shell loop see the previous
    python's JVM for a few seconds during teardown (observed live —
    the first guarded baseline loop refused its own runs 2-4). A JVM
    that is still there after ~20 s is genuinely concurrent.
    """
    import time

    grace = float(os.environ.get("SPARK_GRAFT_GUARD_GRACE", "20"))
    hits = _live_spark_jvms()
    deadline = time.monotonic() + grace
    while hits and time.monotonic() < deadline:
        time.sleep(2)
        hits = _live_spark_jvms()
    if not hits:
        return True
    mode = os.environ.get("SPARK_GRAFT_GUARD", "")
    if allow_tag or mode == "tag":
        print(
            "GUARD: CONTAMINATED — live Spark JVM(s) present; numbers "
            "below are tagged dirty:\n  " + "\n  ".join(hits),
            file=sys.stderr,
            flush=True,
        )
        return False
    print(
        "GUARD: refusing to start — another Spark JVM is alive "
        "(no-concurrent-measurement rule, round-7 verdict item 6). "
        "Kill it or set SPARK_GRAFT_GUARD=tag to run tagged:\n  "
        + "\n  ".join(hits),
        file=sys.stderr,
        flush=True,
    )
    raise SystemExit(3)
