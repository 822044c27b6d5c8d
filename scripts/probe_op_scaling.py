"""Two-parallelism scaling probe for round-4 operators (north-rule
evidence beyond the conversion pipeline). Same discipline as bench.py:
interleaved FIXED draws set a priori, separate process per draw, floors
reported, a noop sink materializing every column.

The registry queries run on sf-dir tables that are TINY at sf0.1 (the
documents table is ~570 rows — the correctness gate's size, not a
throughput input), so this probe materializes scale-appropriate inputs
once (untimed): the bench's x32 replicated triple table (30.9M rows)
and a x64 replicated documents table (~36k docs, texts perturbed per
replica so dedup stays non-degenerate), then times the OPERATORS
directly.

Usage:
    python scripts/probe_op_scaling.py            # full report
    python scripts/probe_op_scaling.py --one <cores> <op>
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
DOCS_X = 64
TRIPLES_PATH = os.path.join(PROBE_DIR, "triples_x32")
DOCS_PATH = os.path.join(PROBE_DIR, f"docs_x{DOCS_X}")
OPS = ["ta_curation", "kg_random_walks", "ta_bpe_encode", "kg_neg_samples"]
PAIR = (8, 32)
ROUNDS = 2  # a priori; no outcome-conditioned stopping


def _ensure_inputs() -> None:
    from rdf2smw_spark.session import get_spark

    if not os.path.exists(os.path.join(TRIPLES_PATH, "_SUCCESS")):
        env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_SCALE_FACTOR="32")
        subprocess.run(
            [sys.executable, "-c",
             "import bench; bench._ensure_probe_input()"],
            cwd=REPO, env=env, check=True,
        )
    if os.path.exists(os.path.join(DOCS_PATH, "_SUCCESS")):
        return
    spark = get_spark(app_name="probe-docs-setup", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

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


def _run_one(cores: int, op: str) -> None:
    from rdf2smw_spark.session import get_spark, release_scoped_caches

    spark = get_spark(app_name=f"probe-{op}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()  # JVM warmup only
    t0 = time.monotonic()
    _load_op(spark, op).write.format("noop").mode("overwrite").save()
    elapsed = time.monotonic() - t0
    release_scoped_caches()
    print(json.dumps({"op": op, "cores": cores, "elapsed_sec": round(elapsed, 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(int(sys.argv[2]), sys.argv[3])
        return
    _ensure_inputs()
    names = sys.argv[1:] or OPS
    draws: dict[tuple[str, int], list[float]] = {}
    for _ in range(ROUNDS):
        for cores in PAIR + PAIR[::-1]:  # interleave 8,32,32,8
            for name in names:
                cmd = [sys.executable, os.path.abspath(__file__), "--one",
                       str(cores), name]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO,
                    env=dict(os.environ, PYTHONPATH=REPO),
                ).stdout.strip().splitlines()
                rec = json.loads(out[-1])
                draws.setdefault((name, cores), []).append(rec["elapsed_sec"])
    report = []
    lo, hi = PAIR
    for name in names:
        tl, th = draws[(name, lo)], draws[(name, hi)]
        t_lo, t_hi = min(tl), min(th)
        report.append({
            "op": name,
            "cores": f"local[{lo}]->local[{hi}]",
            "t_lo_sec": t_lo,
            "t_hi_sec": t_hi,
            "efficiency": round(t_lo / ((hi / lo) * t_hi), 3),
            "draws_lo_sec": tl,
            "draws_hi_sec": th,
        })
    print(json.dumps({
        "inputs": {"triples": "x32 (30.9M rows)", "docs": f"x{DOCS_X}"},
        "rounds": ROUNDS,
        "pairs": report,
    }, indent=1))


if __name__ == "__main__":
    main()
