"""SPARQL-engine scaling evidence (supplementary to bench.py's
north-rule conversion pairs): time one star-BGP + aggregation SPARQL
query over the x32-replicated probe triples at 1 vs 4 separate-JVM
executors (4 cores each), interleaved draws, floor efficiency.

    PYTHONPATH=/root/repo python scripts/sparql_scale_probe.py

Prints one JSON line; results are recorded in BASELINE.md. Uses the
same probe input, warm-up discipline, and fixed-draw interleaving as
bench.py's cluster pairs (methodology in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

QUERY = (
    "PREFIX ont: <http://example.org/onto#>\n"
    "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n"
    "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
    "SELECT ?region ?status (COUNT(?ord) AS ?n_orders)"
    " (SUM(xsd:double(?price)) AS ?total)\n"
    "WHERE {\n"
    "  ?ord ont:customer ?cust .\n"
    "  ?ord ont:orderstatus ?status .\n"
    "  ?ord ont:totalprice ?price .\n"
    "  ?cust a ?nation .\n"
    "  ?nation rdfs:subClassOf ?region .\n"
    "}\n"
    "GROUP BY ?region ?status\n"
)


def probe(executors: int) -> None:
    from rdf2smw_spark.session import get_spark
    from rdf2smw_spark.sparql import sparql_select

    spark = get_spark(
        app_name=f"sparql-scale-e{executors}",
        executors=executors,
        cores_per_executor=4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = os.environ.get(
        "SPARQL_PROBE_INPUT", "/tmp/spark_graft_probe/triples_x32"
    )
    triples = spark.read.parquet(path)
    n = triples.count()
    sparql_select(triples, QUERY).count()  # warm-up: JIT + codegen
    best, rows = 1e18, 0
    for _ in range(2):
        t0 = time.monotonic()
        rows = sparql_select(triples, QUERY).count()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({
        "executors": executors, "elapsed_sec": round(best, 3),
        "n_triples": n, "result_rows": rows,
    }))


def main() -> None:
    if len(sys.argv) > 1:
        probe(int(sys.argv[1]))
        return
    # ensure the probe input exists (bench.py materializes it)
    if not os.path.exists("/tmp/spark_graft_probe/triples_x32/_SUCCESS"):
        import bench

        bench._ensure_probe_input()
    draws: dict[int, list[float]] = {1: [], 4: []}
    meta: dict = {}
    for execs in (1, 4, 1, 4):  # fixed, interleaved (bench.py protocol)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(execs)],
            capture_output=True, text=True,
            env=dict(os.environ, PYTHONPATH="/root/repo"), timeout=3600,
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if lines:
            m = json.loads(lines[-1])
            draws[execs].append(m["elapsed_sec"])
            meta = m
    t1, t4 = min(draws[1]), min(draws[4])
    print(json.dumps({
        "metric": "sparql star-BGP agg scaling, 1->4 executors x 4 cores",
        "n_triples": meta.get("n_triples"),
        "result_rows": meta.get("result_rows"),
        "t_1exec_floor_sec": t1,
        "t_4exec_floor_sec": t4,
        "efficiency_floor": round(t1 / (4 * t4), 3),
        "draws_1": draws[1], "draws_4": draws[4],
    }))


if __name__ == "__main__":
    main()
