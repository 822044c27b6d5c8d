"""Extra measurement harness for the optimization round (bench.py is
FROZEN — this file holds the guide-§1 instrumentation: per-query draws
with the same .count() methodology the frozen bench times, noop-sink
isolation, Spark-job counts per query, and explain("formatted") dumps
for plans/r06/).

Usage:
  python bench_extra.py queries [names...]      # timed draws + job counts
  python bench_extra.py explain <suffix> [names...]  # dump plans/r06/<q>_<suffix>.txt
  python bench_extra.py noop [names...]         # noop-sink timing (all columns)
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DRAWS = int(os.environ.get("SPARK_GRAFT_EXTRA_DRAWS", "3"))

HEADLINE = [
    "kg_fact_rows", "kg_page_stats", "web_extract_text", "web_kg_fact_rows",
    "dd_exact", "dd_minhash_near_dups", "ta_quality", "ann_topk",
    "ev_sessionize", "kg_sparql_select", "kg_pagerank", "kg_rdfs_entailed",
]


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _session():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rdf2smw_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warmup(spark):
    from rdf2smw_spark.operators.convert import triples_to_pages
    from rdf2smw_spark.queries import QUERIES, q_kg_triples

    triples_to_pages(spark, q_kg_triples(spark, SF_DIR).limit(20_000), cache=False).count()
    QUERIES["dd_minhash_near_dups"](spark, "/root/testdata/sf0.001").count()
    QUERIES["kg_fact_rows"](spark, SF_DIR).count()
    spark.catalog.clearCache()


def _job_count(spark, group):
    tracker = spark.sparkContext.statusTracker()
    return len(tracker.getJobIdsForGroup(group))


def cmd_queries(names):
    spark = _session()
    from rdf2smw_spark.queries import QUERIES
    from rdf2smw_spark.session import release_scoped_caches

    _warmup(spark)
    out = {}
    for name in names:
        draws = []
        jobs = 0
        for i in range(DRAWS):
            spark.catalog.clearCache()
            release_scoped_caches()
            group = f"{name}-{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.monotonic()
            n = QUERIES[name](spark, SF_DIR).count()
            draws.append(time.monotonic() - t0)
            jobs = _job_count(spark, group)
            spark.sparkContext.setJobGroup(None, None)
        out[name] = {
            "floor": round(min(draws), 3),
            "median": round(_median(draws), 3),
            "draws": [round(x, 3) for x in draws],
            "rows": n,
            "spark_jobs_last_draw": jobs,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_floor": round(sum(v["floor"] for v in out.values()), 3)}))


def cmd_noop(names):
    spark = _session()
    from rdf2smw_spark.queries import QUERIES
    from rdf2smw_spark.session import release_scoped_caches

    _warmup(spark)
    for name in names:
        draws = []
        for _ in range(DRAWS):
            spark.catalog.clearCache()
            release_scoped_caches()
            t0 = time.monotonic()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            draws.append(time.monotonic() - t0)
        print(json.dumps({name: {"noop_floor": round(min(draws), 3),
                                 "draws": [round(x, 3) for x in draws]}}), flush=True)


def cmd_explain(suffix, names):
    spark = _session()
    from rdf2smw_spark.queries import QUERIES
    from rdf2smw_spark.session import release_scoped_caches

    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        release_scoped_caches()
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{path}: {len(plan)} bytes, Exchange x{n_ex}", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "explain":
        suffix = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        cmd_explain(suffix, names)
    elif cmd == "noop":
        cmd_noop(sys.argv[2:] or HEADLINE)
    else:
        cmd_queries(sys.argv[2:] or HEADLINE)
