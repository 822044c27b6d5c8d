"""Two-cluster-size scaling probe for round-4 operators (north-rule
evidence beyond the conversion pipeline), under the SAME separate-JVM
protocol as bench.py's north pair: local-cluster 1 -> 4 executors x 4
cores (each executor its own JVM/heap — the sandbox rendering of
"N and 4N executors"; shared-JVM local[8]->local[32] measures this
box's DRAM ceiling, not executor scaling — BASELINE.md).

Protocol (set a priori, no outcome-conditioned choices):
  - inputs materialized once, untimed: x16-replicated triples (15.4M
    rows) and x16-replicated documents (~9k docs, texts perturbed per
    replica so dedup/BPE stay non-degenerate) — sized so the 1-executor
    draws run 45-120s (outlasting the host's short interference windows)
    while the full probe fits in ~1h;
  - per draw: fresh process, one FULL untimed warm-up pass (fresh
    executor JVMs are half-JITed; bench.py measured first-run ~2x),
    then ONE timed pass;
  - 2 pair rounds, levels interleaved (1,4,4,1) -> 4 draws/level;
    floors AND medians reported, every raw draw recorded.

Earlier shared-JVM results are kept in /tmp/op_scaling2.json for
transparency; they read 0.24-0.56 for the same operators because all
32 threads share one heap/allocator.

Usage:
    python scripts/probe_op_scaling.py            # full report
    python scripts/probe_op_scaling.py --one <executors> <op>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = "/tmp/spark_graft_probe"
TRIPLES_X = 16
DOCS_X = 16
TRIPLES_PATH = os.path.join(PROBE_DIR, f"triples_x{TRIPLES_X}")
DOCS_PATH = os.path.join(PROBE_DIR, f"docs_x{DOCS_X}")
OPS = ["ta_curation", "kg_random_walks", "ta_bpe_encode", "kg_neg_samples"]
PAIR = (1, 4)  # executors; 4 cores each (SPARK_GRAFT_EXEC_CORES rationale in bench.py)
EXEC_CORES = 4
ROUNDS = 2  # a priori; no outcome-conditioned stopping


def _ensure_inputs() -> None:
    from pyspark.sql import functions as F

    from rdf2smw_spark.session import get_spark

    need_triples = not os.path.exists(os.path.join(TRIPLES_PATH, "_SUCCESS"))
    need_docs = not os.path.exists(os.path.join(DOCS_PATH, "_SUCCESS"))
    if not (need_triples or need_docs):
        return
    spark = get_spark(app_name="probe-op-setup", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    if need_triples:
        from rdf2smw_spark.queries import testdata_triples

        t = testdata_triples(spark, SF_DIR)
        reps = spark.range(TRIPLES_X).select(F.col("id").alias("rep"))
        big = t.crossJoin(reps).select(
            F.concat("subj", F.lit("/r"), F.col("rep")).alias("subj"),
            "pred", "obj", "obj_is_iri", "obj_datatype", "src_url",
        )
        big.repartition(64).write.mode("overwrite").parquet(TRIPLES_PATH)
    if need_docs:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        reps = spark.range(DOCS_X).select(F.col("id").alias("rep"))
        big = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat("text", F.lit(" rep"), F.col("rep")).alias("text"),
        )
        big.repartition(64).write.mode("overwrite").parquet(DOCS_PATH)
    spark.stop()


def _load_op(spark, op: str):
    from pyspark.sql import functions as F

    if op in ("ta_curation", "ta_bpe_encode"):
        docs = spark.read.parquet(DOCS_PATH)
        if op == "ta_curation":
            from rdf2smw_spark.operators.curate import curate_report

            return curate_report(docs, docs.filter(F.col("doc_id") % 37 == 0))
        from rdf2smw_spark.operators.bpe import bpe_encode_subset

        return bpe_encode_subset(docs, docs.filter(F.col("doc_id") % 13 == 0))
    triples = spark.read.parquet(TRIPLES_PATH)
    if op == "kg_random_walks":
        from rdf2smw_spark.operators.graph import random_walks

        return random_walks(triples)
    from rdf2smw_spark.operators.negsample import negative_samples

    return negative_samples(triples)


def _run_one(executors: int, op: str) -> None:
    from rdf2smw_spark.session import get_spark, release_scoped_caches

    spark = get_spark(
        app_name=f"probe-{op}-e{executors}",
        executors=executors,
        cores_per_executor=EXEC_CORES,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # full untimed warm-up pass: JIT + codegen + executor registration
    _load_op(spark, op).write.format("noop").mode("overwrite").save()
    release_scoped_caches()
    t0 = time.monotonic()
    _load_op(spark, op).write.format("noop").mode("overwrite").save()
    elapsed = time.monotonic() - t0
    release_scoped_caches()
    print(json.dumps({"op": op, "executors": executors,
                      "elapsed_sec": round(elapsed, 3)}))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(int(sys.argv[2]), sys.argv[3])
        return
    _ensure_inputs()
    names = sys.argv[1:] or OPS
    draws: dict[tuple[str, int], list[float]] = {}
    for _ in range(ROUNDS):
        for execs in PAIR + PAIR[::-1]:  # interleave 1,4,4,1
            for name in names:
                cmd = [sys.executable, os.path.abspath(__file__), "--one",
                       str(execs), name]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO,
                    env=dict(os.environ, PYTHONPATH=REPO),
                ).stdout.strip().splitlines()
                rec = json.loads([l for l in out if l.startswith("{")][-1])
                draws.setdefault((name, execs), []).append(rec["elapsed_sec"])
    report = []
    lo, hi = PAIR
    ratio = hi / lo
    for name in names:
        tl, th = draws[(name, lo)], draws[(name, hi)]
        t_lo, t_hi = min(tl), min(th)
        m_lo, m_hi = _median(tl), _median(th)
        report.append({
            "op": name,
            "cluster": f"{lo}->{hi} executors x {EXEC_CORES} cores (separate JVMs)",
            "t_lo_sec": t_lo,
            "t_hi_sec": t_hi,
            "efficiency": round(t_lo / (ratio * t_hi), 3),
            "efficiency_median": round(m_lo / (ratio * m_hi), 3),
            "draws_lo_sec": tl,
            "draws_hi_sec": th,
        })
    print(json.dumps({
        "inputs": {"triples": f"x{TRIPLES_X}", "docs": f"x{DOCS_X}"},
        "rounds": ROUNDS,
        "protocol": "separate-JVM local-cluster pair, full warm-up pass + "
                    "1 timed pass per fresh-process draw, fixed draws a priori",
        "pairs": report,
    }, indent=1))


if __name__ == "__main__":
    main()
