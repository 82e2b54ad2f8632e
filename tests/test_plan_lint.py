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

Allowlist keys are (path-suffix, enclosing-function, var-name) — NOT
just (path, var) — so a future explode-derived variable reusing an
allowlisted name in a different function is still linted (round-6
ADVICE). test_allowlist_not_stale asserts every ALLOW key still
matches a live explode-derived assignment, so a refactor that renames
or checkpoints a guarded variable fails the suite loudly instead of
leaving a dead entry silently covering new code.
"""

import ast
import os
import re

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "blog_snapshotbackup_azuredatalake_spark",
)

# (path-suffix, enclosing function, var-name): audited-safe rationale
ALLOW = {
    # bounded daily/series relations (≤ time-span rows), both sides tiny
    ("plans/timeseries.py", "q_autocorr_daily", "a"):
        "daily series ×7 lags, series-sized",
    # grid/obs are bounded (event_type × hour) / agg-derived
    ("plans/analytics_ext.py", "q_gap_fill", "obs"): "bounded hourly grid",
    ("plans/analytics_ext.py", "q_gap_fill", "grid"): "bounded hourly grid",
    # pairs derives from a checkpointed relation (unknown→large stats)
    ("plans/analytics_ext.py", "q_basket_affinity", "pairs"):
        "checkpoint-derived, agg sides",
    # explicit broadcast of a bounded side at the join site
    ("streaming/entries.py", "stream_hist_quantile", "targets"):
        "joins F.broadcast(cum)",
    ("operators/sketch.py", "cms_rank_heavy_hitters", "probes"):
        "joins F.broadcast(cells)",
    ("operators/sketch.py", "sketch_hist_quantile", "targets"):
        "joins F.broadcast(cum)",
    ("operators/text.py", "text_ngram_lm", "bigr"):
        "joins F.broadcast(model), vocab-bounded",
    ("operators/text.py", "text_perplexity_filter", "bigr"):
        "joins F.broadcast(model), vocab-bounded",
    # model/heads are vocab²-bounded aggs of bigr (AQE-exact stats);
    # they read as explode-derived only because the vocab explode on
    # the following statement bleeds into their 8-line stmt window
    ("operators/text.py", "text_ngram_lm", "model"):
        "agg-derived vocab² model, stmt-window bleed",
    ("operators/text.py", "text_ngram_lm", "heads"):
        "agg-derived vocab² model, stmt-window bleed",
    # tv-divergence grid: both join sides are agg-derived (AQE-exact)
    ("operators/text.py", "text_source_tv_divergence", "counts"):
        "agg-derived vocab grid",
    ("operators/curation.py", "corpus_decontaminate", "train_g"):
        "left-semi vs bcast(bench_g)",
    # calibration truth sets: grams_cached is checkpoint-backed
    ("operators/dedup.py", "dedup_simhash", "ex"):
        "checkpoint-backed grams, capped cal set",
    ("operators/dedup.py", "dedup_substring", "ex"):
        "checkpoint-backed grams, capped cal set",
    ("operators/dedup.py", "dedup_lsh_calibration", "ex"):
        "checkpoint-backed grams, capped cal set",
    # chunked substrate is localCheckpoint'ed; cdc/fixed are per-source aggs
    ("operators/multimodal.py", "mm_cdc_chunk_dedup", "cdc"):
        "aggs of checkpointed substrate",
    ("operators/multimodal.py", "mm_cdc_chunk_dedup", "fixed"):
        "aggs of checkpointed substrate",
    # nu/nv are agg-derived (AQE-exact)
    ("operators/graph.py", "graph_clustering_coefficient", "nu"):
        "agg-derived adjacency",
    ("operators/graph.py", "graph_clustering_coefficient", "nv"):
        "agg-derived adjacency",
    # qdf is the bounded query set (each site audited per-function)
    ("operators/similarity.py", "ann_hybrid_rrf", "probes"):
        "bounded query probe set",
    ("operators/similarity.py", "_ivf_search", "probes"):
        "bounded query probe set",
    ("operators/similarity.py", "ann_filtered_search", "probes"):
        "bounded query probe set",
    ("operators/similarity.py", "ann_nprobe_curve", "probes"):
        "bounded query probe set",
    ("operators/similarity.py", "ann_topk_ivfpq", "probes"):
        "bounded query probe set",
    # SCD2 dim is dimension-scale by contract
    ("operators/snapshot.py", "snap_scd2_asof_join", "dim"):
        "dimension-scale SCD2 relation",
    # salt replication of an explicitly small dim (the utility contract)
    ("functions/skew.py", "salted_join", "salted_facts"):
        "salted-join utility contract",
    ("functions/skew.py", "salted_join", "replicated"):
        "salted-join utility contract",
}


def _scan():
    """Return (violations, found_keys): every unguarded explode-probe
    join, plus the set of (rel, func, name) explode-derived assignment
    keys seen — the staleness test checks ALLOW against the latter."""
    violations = []
    found = set()
    for root, _, files in os.walk(BASE):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, BASE)
            src = open(p).read()
            lines = src.split("\n")
            # AST-scoped enclosing function (round-7 ADVICE): the old
            # column-0 `def` regex attributed method bodies and
            # post-function module code to the previous top-level def.
            # Innermost function wins; module level maps to None.
            func_of = {}
            for node in ast.walk(ast.parse(src)):
                if isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    for li in range(node.lineno, node.end_lineno + 1):
                        prev = func_of.get(li)
                        if prev is None or node.lineno > prev[0]:
                            func_of[li] = (node.lineno, node.name)
            assigns = {}
            for i, ln in enumerate(lines):
                func = (func_of.get(i + 1) or (0, None))[1]
                m = re.match(r"\s*(\w+) = ", ln)
                if m:
                    stmt = "\n".join(lines[i : i + 8])
                    if (
                        "explode" in stmt
                        and "localCheckpoint" not in stmt
                    ):
                        assigns[(m.group(1), func)] = i + 1
                        found.add((rel, func, m.group(1)))
            for (name, fn), lineno in assigns.items():
                if (rel, fn, name) in ALLOW:
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
                        violations.append(
                            f"{rel}:{j}: {name} in {fn} -> "
                            f"{ln.strip()[:80]}"
                        )
                        break
    return violations, found


def test_no_unhinted_explode_probe_joins():
    v, _ = _scan()
    assert not v, (
        "explode-derived relation joined without an explicit strategy "
        "(merge hint / broadcast / checkpoint) — static size estimates "
        "are pre-explode and WILL mis-broadcast at scale; either fix "
        "the join or allowlist with a rationale:\n" + "\n".join(v)
    )


def test_allowlist_not_stale():
    _, found = _scan()
    stale = [k for k in ALLOW if k not in found]
    assert not stale, (
        "ALLOW entries no longer match any live explode-derived "
        "assignment — the guarded variable was renamed, moved, or "
        "checkpointed; delete or re-key these entries so the "
        "allowlist can't silently cover new code:\n"
        + "\n".join(str(k) for k in stale)
    )
