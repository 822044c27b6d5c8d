"""Table sinks with 100-TB layout control: hash-bucketed tables (joins
and aggregations on the bucket key read back with ZERO exchange) and
value-partitioned directories (partition pruning at the scan).

The reference's only sink is a concatenated XML string
(strfilewriter.go); at web scale the working tables between pipeline
stages are parquet, and the dominant cost of re-joining them every run
is the shuffle. Bucketing pre-pays that shuffle ONCE at write time:
`bucketBy(N, key)` + `sortBy(key)` stores bucket ids in the catalog, so
any later equi-join or groupBy on the key is exchange-free — the 100-TB
equivalent of an index. Partitioning (`partitionBy(col)`) instead
splits the directory tree by column VALUE so predicate pushdown prunes
whole directories before any task launches.

Bucketed metadata lives in the session catalog (`saveAsTable`); plain
`.parquet()` paths cannot carry it. Tables are written as EXTERNAL
(explicit path) so nothing lands in a default warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write df as an external bucketed+sorted parquet table. n_buckets
    is a layout contract shared by every table that wants to co-join:
    same key, same bucket count => bucket-local joins. Size it to the
    target data (100 TB / n_buckets should fit an executor's scan unit);
    it can exceed cluster cores — Spark schedules buckets as tasks."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str = "lang"
) -> None:
    """Write df partitioned by column value (one directory per value).
    Scans filtering on partition_col prune directories at planning time
    — the right layout for low-cardinality routing columns (language,
    crawl date, source), NOT for high-cardinality keys (that's
    bucketing's job; a 10^8-value partition column is a small-files
    catastrophe)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back with its layout metadata intact (a
    plain spark.read.parquet(path) would lose the bucket spec)."""
    return spark.table(name)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a small-files parquet directory into ~target_bytes files;
    returns the output file count. Small files are the silent killer of
    100-TB scans (one scheduler task + one footer read each; a million
    16 KB files costs more in task overhead than in IO) — streaming
    sinks and fine-grained partitionBy both produce them, so compaction
    is a standing maintenance pass. Sizing reads the REAL byte size
    from the filesystem (works for any Hadoop FS, not just local), and
    the rewrite uses coalesce — a shuffle-free merge of existing
    partitions — not repartition, which would pay a full shuffle just
    to move bytes."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_out = max(1, -(-int(total) // target_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    out = jvm.org.apache.hadoop.fs.Path(dst)
    return sum(
        1
        for f in fs.listStatus(out)
        if f.getPath().getName().endswith(".parquet")
    )
