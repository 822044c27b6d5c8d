"""Two-parallelism scaling probe for individual registered operators
(north-rule evidence for round-4 additions, same discipline as
bench.py's conversion probes: interleaved FIXED draws, separate process
per draw, floors reported; a noop sink materializes every column).

Usage:
    python scripts/probe_op_scaling.py [sf_dir] [query ...]
    python scripts/probe_op_scaling.py --one <cores> <sf_dir> <query>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = ["ta_curation", "kg_random_walks", "ta_bpe_encode"]
PAIR = (8, 32)
ROUNDS = 2  # a priori; no outcome-conditioned stopping


def _run_one(cores: int, sf_dir: str, name: str) -> None:
    from rdf2smw_spark.queries import QUERIES
    from rdf2smw_spark.session import get_spark, release_scoped_caches

    spark = get_spark(app_name=f"probe-{name}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + codegen on an unrelated tiny job, not the measured op
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.monotonic()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.monotonic() - t0
    release_scoped_caches()
    print(json.dumps({"query": name, "cores": cores, "elapsed_sec": round(elapsed, 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    draws: dict[tuple[str, int], list[float]] = {}
    for _ in range(ROUNDS):
        for cores in PAIR + PAIR[::-1]:  # interleave 8,32,32,8
            for name in names:
                cmd = [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    str(cores),
                    sf_dir,
                    name,
                ]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO
                ).stdout.strip().splitlines()
                rec = json.loads(out[-1])
                draws.setdefault((name, cores), []).append(rec["elapsed_sec"])
    report = []
    lo, hi = PAIR
    for name in names:
        tl, th = draws[(name, lo)], draws[(name, hi)]
        t_lo, t_hi = min(tl), min(th)
        report.append(
            {
                "query": name,
                "cores": f"local[{lo}]->local[{hi}]",
                "t_lo_sec": t_lo,
                "t_hi_sec": t_hi,
                "efficiency": round(t_lo / ((hi / lo) * t_hi), 3),
                "draws_lo_sec": tl,
                "draws_hi_sec": th,
            }
        )
    print(json.dumps({"sf_dir": sf_dir, "rounds": ROUNDS, "pairs": report}, indent=1))


if __name__ == "__main__":
    main()
