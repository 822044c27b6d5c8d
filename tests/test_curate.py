"""Curation audit (operators/curate.py): each gate fires, precedence
holds, and the report is deterministic across partitioning."""

from pyspark.sql import functions as F

from rdf2smw_spark.operators.curate import curate_report

# three UNRELATED long texts: near-dup and contamination must only fire
# where planted, so the fixtures share no phrases
A = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest where it finds a quiet stream to drink from"
)
B = (
    "ancient mariners charted coastlines using brass instruments while "
    "monsoon winds carried spice merchants across vast turquoise oceans "
    "toward harbors filled with lanterns and song"
)
C = (
    "volcanic soil nourishes terraced vineyards high above the valley "
    "floor where farmers harvest grapes each autumn under amber skies "
    "before the first mountain frost arrives"
)


def _corpus(spark):
    rows = [
        (1, A),
        (2, A),                      # exact dup of 1 -> exact_dup
        (3, A + " tiny extra tail"),  # near dup of 1 -> near_dup
        (4, "!!! ??? ### $$$ %%%"),   # punctuation soup -> low_quality
        (5, B),                       # equals the benchmark -> contaminated
        (6, C),                       # clean, unique -> kept
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _benchmark(spark):
    return spark.createDataFrame([(99, B)], "doc_id long, text string")


def test_each_gate_fires_and_kept_is_consistent(spark):
    out = {
        r["doc_id"]: r
        for r in curate_report(_corpus(spark), _benchmark(spark)).collect()
    }
    assert len(out) == 6
    assert out[1]["kept"] and out[1]["drop_reason"] is None
    assert out[2]["drop_reason"] == "exact_dup"
    assert out[3]["drop_reason"] == "near_dup"
    assert out[4]["drop_reason"] == "low_quality"
    assert out[5]["drop_reason"] == "contaminated"
    assert out[6]["kept"] and out[6]["drop_reason"] is None
    for r in out.values():
        assert r["kept"] == (r["drop_reason"] is None)


def test_precedence_exact_dup_beats_contaminated(spark):
    # two copies of the benchmark text: doc 11 is canonical (and
    # contaminated); doc 12 is an exact dup AND contaminated -> the
    # exact_dup reason must win on 12
    spark_df = _corpus(spark).unionByName(
        _corpus(spark)
        .sparkSession.createDataFrame(
            [(12, B)],
            "doc_id long, text string",
        )
    )
    out = {
        r["doc_id"]: r["drop_reason"]
        for r in curate_report(spark_df, _benchmark(spark)).collect()
    }
    assert out[5] == "contaminated"   # canonical copy: contamination fires
    assert out[12] == "exact_dup"     # duplicate copy: dedup wins


def test_deterministic_across_partitioning(spark):
    a = curate_report(_corpus(spark), _benchmark(spark)).collect()
    b = curate_report(
        _corpus(spark).repartition(7), _benchmark(spark)
    ).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
