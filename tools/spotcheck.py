#!/usr/bin/env python3
"""Fresh-process bench spot-check: the protocol check behind SPOTCHECK_r*.json.

For each named query, launch a FRESH sbt/JVM `graft.Bench` restricted to that
one query (SPARK_GRAFT_BENCH_ONLY), writing its artifact to a scratch path so
the graded BENCH_FULL.json and its cross-round reference stay untouched, and
compare the full-sweep artifact's min against the isolated min-of-2.

Criterion (one-sided, r9 protocol): the ARTIFACT number must not exceed 1.5x
the isolated number — the r8 pathology was artifact >> isolated (session-state
drag). artifact < isolated is the healthy direction: a fresh two-minute JVM
never reaches the full sweep's C2-compiled steady state, so sub-0.5s queries
carry ~0.05-0.2s of JVM-maturity ambient there.

Usage: python3 tools/spotcheck.py <out.json> <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (32)
"""
import json
import os
import re
import subprocess
import sys


def isolated_min(query: str, sf_dir: str, cpus: str) -> float:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=query,
               SPARK_GRAFT_BENCH_OUT="/tmp/graft_spotcheck_scratch.json",
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=cpus)
    out = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                         env=env, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        m = re.search(r'\{"metric":"total".*\}', line)
        if m:
            doc = json.loads(m.group(0))
            return doc["queries"][query]
    raise RuntimeError(f"no bench line for {query}:\n{out.stdout[-2000:]}")


# The standard list when no queries are named: the r10 cross-section
# (one per heavy family + the three r9 TPC-H drifters) plus the dedup
# family whose r9->r10 artifact drift (dedup_eval 0.95->3.42s etc.) was
# never adjudicated — the r10 verdict's ask.
STANDARD = [
    "dedup_edit_distance", "dedup_simhash", "dq_checks",
    "generator_explode_map", "graph_modularity", "sql_tpch_q6",
    "text_langid", "sql_tpch_q2", "sql_tpch_q8", "sql_tpch_q9",
    "sql_ch_funnel", "sql_ch_array_join",
    "dedup_eval", "dedup_incremental", "dedup_passages", "dq_benford",
]


def main() -> int:
    out_path, queries = sys.argv[1], sys.argv[2:]
    if not queries:
        queries = STANDARD
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    artifact = json.load(open("BENCH_FULL.json"))
    comparisons = []
    n_inflated = 0
    for q in queries:
        art = artifact["queries"][q]
        iso = isolated_min(q, sf_dir, cpus)
        ratio = round(art / iso, 3) if iso > 0 else -1.0
        inflated = art > 1.5 * iso
        n_inflated += inflated
        comparisons.append({
            "query": q,
            "artifact_s": art,
            "isolated_min_of_2_s": round(iso, 3),
            "artifact_over_isolated": ratio,
            "inflated": inflated,
        })
        print(f"{'INFLATED' if inflated else 'ok':8s} {q}: artifact {art:.3f}s "
              f"vs isolated {iso:.3f}s ({ratio}x)")
    doc = {
        "protocol": "fresh-process SPARK_GRAFT_BENCH_ONLY spot re-runs vs the "
                    f"full-sweep artifact ({artifact.get('n_queries')} queries, "
                    f"load_gate {artifact.get('load_gate')})",
        "criterion": "one-sided: the ARTIFACT number must not exceed 1.5x the "
                     "isolated number — the r8 pathology was artifact >> isolated "
                     "(state drag); artifact < isolated is the healthy direction "
                     "(a fresh 2-minute session never reaches the full sweep's "
                     "C2-compiled steady state)",
        "full_sweep": {"total": artifact.get("value"),
                       "queries": artifact.get("n_queries")},
        "comparisons": comparisons,
        "n_inflated": n_inflated,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"\n{len(comparisons) - n_inflated}/{len(comparisons)} clean -> {out_path}")
    return 1 if n_inflated else 0


if __name__ == "__main__":
    sys.exit(main())
