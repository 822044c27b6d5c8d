"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "throughput": {triples_per_sec, pages_per_sec},
   "scaling": {cores_lo, cores_hi, t_lo, t_hi, efficiency}}

Scaling evidence (north rule: >=0.8 efficiency from N to 4N executors —
no real cluster in this sandbox, so the same flagship job runs in two
subprocess Spark sessions at local[8] and local[32] on the same input;
efficiency = throughput(4N) / (4 * throughput(N)), amortizing fixed
startup by subtracting a measured session-overhead baseline).

Usage: python bench.py            # full bench + scaling
       python bench.py --scale-probe N   # internal: one flagship run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_fact_rows",       # full reference-semantics KG conversion
    "kg_page_stats",
    "web_extract_text",   # pandas-UDF HTML->text over the synthetic crawl
    "web_kg_fact_rows",   # end-to-end web pipeline
    "dd_exact",
    "dd_minhash_near_dups",
    "ta_quality",
    "ann_topk",
    "ev_sessionize",
]


def _flagship(spark, sf_dir: str) -> tuple[int, int]:
    """The scaling probe: testdata triples -> pages -> fact rows.
    Returns (n_triples, n_fact_rows)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rdf2smw_spark.queries import q_kg_fact_rows, q_kg_triples

    n_triples = q_kg_triples(spark, sf_dir).count()
    n_facts = q_kg_fact_rows(spark, sf_dir).count()
    return n_triples, n_facts


def scale_probe(cores: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rdf2smw_spark.session import get_spark

    spark = get_spark(app_name=f"bench-scale-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.monotonic()
    spark.range(1).count()  # warm the session before timing
    t0 = time.monotonic()
    n_triples, n_facts = _flagship(spark, SF_DIR)
    elapsed = time.monotonic() - t0
    print(json.dumps({
        "cores": cores, "elapsed_sec": round(elapsed, 3),
        "startup_sec": round(t0 - t_start, 3),
        "n_triples": n_triples, "n_fact_rows": n_facts,
    }))


def run_scaling() -> dict:
    out = {}
    for cores in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-probe", str(cores)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[cores] = json.loads(line)
    t_lo, t_hi = out[8]["elapsed_sec"], out[32]["elapsed_sec"]
    n = out[32]["n_triples"]
    thr_lo, thr_hi = n / t_lo, n / t_hi
    return {
        "cores_lo": 8, "cores_hi": 32,
        "t_lo_sec": t_lo, "t_hi_sec": t_hi,
        "triples_per_sec_lo": round(thr_lo), "triples_per_sec_hi": round(thr_hi),
        "efficiency": round(thr_hi / (4 * thr_lo), 3),
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rdf2smw_spark.queries import QUERIES
    from rdf2smw_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        counts[name] = QUERIES[name](spark, SF_DIR).count()
        times[name] = round(time.monotonic() - t0, 3)

    # throughput on the flagship conversion
    t0 = time.monotonic()
    n_triples, n_facts = _flagship(spark, SF_DIR)
    conv_sec = time.monotonic() - t0
    n_pages = counts.get("kg_page_stats", 0)

    scaling = None
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        try:
            scaling = run_scaling()
        except Exception as exc:  # scaling evidence is best-effort in bench
            scaling = {"error": str(exc)[:200]}

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "throughput": {
            "triples_per_sec": round(n_triples / conv_sec),
            "pages_per_sec": round(n_pages / conv_sec) if n_pages else None,
            "n_triples": n_triples,
            "n_fact_rows": n_facts,
            "conversion_sec": round(conv_sec, 3),
        },
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scale-probe":
        scale_probe(int(sys.argv[2]))
    else:
        main()
