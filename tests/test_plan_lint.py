"""Source-level plan-shape lint: joins probing an explode-derived
relation must carry an explicit strategy (hint / broadcast /
checkpoint) — Spark's static size estimate for an exploded relation is
the PRE-explode scan size, so leaving the choice to the planner
broadcast 12.1 GiB build sides at sf10/sf30 (text_cooccurrence,
text_gram_novelty, dedup_paragraph — all found by cold suite runs,
round 6). This guard makes the next occurrence a test failure instead
of a scale-run crash.

Mechanics: for every assignment whose defining statement contains an
explode and no localCheckpoint, a `.join(` on that name within the
next 60 lines must be preceded (same statement window) by a
`.hint(`, an `F.broadcast(` / `bcast(` on either side, or the name
must be re-bound through a checkpoint first. Sites audited and judged
safe (bounded series, agg-derived sides with exact AQE stats,
explicit broadcasts) are allowlisted with their rationale.
"""

import os
import re

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "blog_snapshotbackup_azuredatalake_spark",
)

# (path-suffix, var-name): audited-safe rationale
ALLOW = {
    # bounded daily/series relations (≤ time-span rows), both sides tiny
    ("plans/timeseries.py", "a"): "daily series ×7 lags, series-sized",
    # grid/obs are bounded (event_type × hour) / agg-derived
    ("plans/analytics_ext.py", "obs"): "bounded hourly grid",
    ("plans/analytics_ext.py", "grid"): "bounded hourly grid",
    # pairs derives from a checkpointed relation (unknown→large stats)
    ("plans/analytics_ext.py", "pairs"): "checkpoint-derived, agg sides",
    # explicit broadcast of a bounded side at the join site
    ("streaming/entries.py", "targets"): "joins F.broadcast(cum)",
    ("operators/sketch.py", "probes"): "joins F.broadcast(cells)",
    ("operators/sketch.py", "targets"): "joins F.broadcast(cum)",
    ("operators/text.py", "bigr"): "joins F.broadcast(model), vocab-bounded",
    # tv-divergence grid: both join sides are agg-derived (AQE-exact)
    ("operators/text.py", "counts"): "agg-derived vocab grid",
    ("operators/curation.py", "train_g"): "left-semi vs bcast(bench_g)",
    # calibration truth set: grams_cached is checkpoint-backed
    ("operators/dedup.py", "ex"): "checkpoint-backed grams, capped cal set",
    # chunked substrate is localCheckpoint'ed; cdc/fixed are per-source aggs
    ("operators/multimodal.py", "cdc"): "aggs of checkpointed substrate",
    ("operators/multimodal.py", "fixed"): "aggs of checkpointed substrate",
    # adj/nu/nv are agg-derived (AQE-exact); o is cache/checkpoint-backed
    ("operators/graph.py", "nu"): "agg-derived adjacency",
    ("operators/graph.py", "nv"): "agg-derived adjacency",
    # qdf is the bounded query set
    ("operators/similarity.py", "probes"): "bounded query probe set",
    # SCD2 dim is dimension-scale by contract
    ("operators/snapshot.py", "dim"): "dimension-scale SCD2 relation",
    # salt replication of an explicitly small dim (the utility contract)
    ("functions/skew.py", "salted_facts"): "salted-join utility contract",
    ("functions/skew.py", "replicated"): "salted-join utility contract",
}


def _violations():
    out = []
    for root, _, files in os.walk(BASE):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, BASE)
            lines = open(p).read().split("\n")
            assigns = {}
            for i, ln in enumerate(lines):
                m = re.match(r"\s*(\w+) = ", ln)
                if m:
                    stmt = "\n".join(lines[i : i + 8])
                    if (
                        "explode" in stmt
                        and "localCheckpoint" not in stmt
                    ):
                        assigns[m.group(1)] = i + 1
            for name, lineno in assigns.items():
                if (rel, name) in ALLOW:
                    continue
                for j, ln in enumerate(
                    lines[lineno : lineno + 60], start=lineno + 1
                ):
                    if re.search(
                        rf"\b{name}\s*=\s*{name}\.localCheckpoint", ln
                    ) or re.search(rf"\b{name}\.hint\(", ln):
                        break
                    if re.search(rf"\b{name}\.join\(", ln) or re.search(
                        rf"\.join\({name}\b", ln
                    ):
                        if (
                            "broadcast" in ln
                            or "bcast" in ln
                            or ".hint(" in ln
                        ):
                            break
                        out.append(f"{rel}:{j}: {name} -> {ln.strip()[:80]}")
                        break
    return out


def test_no_unhinted_explode_probe_joins():
    v = _violations()
    assert not v, (
        "explode-derived relation joined without an explicit strategy "
        "(merge hint / broadcast / checkpoint) — static size estimates "
        "are pre-explode and WILL mis-broadcast at scale; either fix "
        "the join or allowlist with a rationale:\n" + "\n".join(v)
    )
