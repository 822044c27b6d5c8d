"""Checkpoint + lineage layer (north rule: every stage checkpoints with
per-partition lineage rows; the pipeline resumes idempotently).

Storage is parquet + a _SUCCESS-gated manifest (the Iceberg runtime jar
is not available offline — the interface is format-agnostic, so swapping
`parquet` for `iceberg` is a one-line change; snapshot semantics here
come from the atomic _SUCCESS marker Spark writes last).

Lineage rows: (run_id, stage, partition_id, input_split, rows_out,
wall_ms) — one per output file, derived from the files actually written,
so a resumed run can audit exactly what each task produced.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage")

    def is_complete(self, stage: str, fingerprint: str | None = None) -> bool:
        """A stage is resumable iff its snapshot is complete AND was
        produced under the same parameter fingerprint. Without the
        fingerprint check, re-running a work_dir with a changed or
        newly-enabled gate (--min-quality, --near-dedup, …) silently
        resumed the stale snapshot and the gate had no effect."""
        if not os.path.exists(os.path.join(self.stage_path(stage), "_SUCCESS")):
            return False
        if fingerprint is None:
            return True
        fp_file = os.path.join(self.stage_path(stage), "_FINGERPRINT")
        try:
            with open(fp_file) as fh:
                return fh.read().strip() == fingerprint
        except OSError:
            return False

    def read(self, stage: str) -> DataFrame:
        """Read a snapshot back; an EMPTY snapshot (a gate that dropped
        every row writes _SUCCESS but no part files) reads through the
        schema sidecar materialize() stored, instead of failing
        UNABLE_TO_INFER_SCHEMA."""
        path = self.stage_path(stage)
        try:
            return self.spark.read.parquet(path)
        except Exception:
            schema_file = os.path.join(path, "_SCHEMA")
            if os.path.exists(schema_file):
                from pyspark.sql.types import StructType
                import json as _json

                with open(schema_file) as fh:
                    schema = StructType.fromJson(_json.load(fh))
                return self.spark.read.schema(schema).parquet(path)
            raise

    def _append_lineage(self, stage: str, wall_ms: int) -> None:
        out = self.read(stage)
        # partition_id parses the writer's own part number out of the
        # file name (part-NNNNN-...) instead of a dense_rank over an
        # UNPARTITIONED window — one row per file still meant one
        # reducer sorting every split name (10^6-10^8 rows per stage at
        # web scale). -1 flags a non-Spark-written file (external table
        # import); ids stay exactly the contiguous 0..n-1 the writer
        # assigned, so the lineage semantics are unchanged.
        part_no = F.regexp_extract(F.col("input_split"), "part-([0-9]+)", 1)
        lin = (
            out.groupBy(F.input_file_name().alias("input_split"))
            .agg(F.count("*").alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.when(part_no != "", part_no.cast("int"))
                .otherwise(F.lit(-1))
                .alias("partition_id"),
                "input_split",
                F.col("rows_out").cast("long"),
                F.lit(wall_ms).cast("long").alias("wall_ms"),
            )
        )
        lin.write.mode("append").parquet(self.lineage_path())

    def materialize(
        self,
        df: DataFrame,
        stage: str,
        resume: bool = True,
        partition_by: list[str] | None = None,
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Write-once stage checkpoint: skip if a complete snapshot
        exists under the same parameter fingerprint (resume), else
        compute, write atomically, record lineage. Always returns the
        on-disk DataFrame so downstream stages read the checkpoint, not
        the recomputed plan.

        fingerprint: hash of every parameter (and upstream fingerprint)
        that shapes this stage's output. Callers chain them (pipeline.py)
        so recomputing one stage transitively invalidates everything
        downstream — the Iceberg analogue is the snapshot's parent id.

        partition_by: hive-style directory partitioning of the snapshot —
        the parquet rendering of Iceberg's partition transforms (the
        north star's `bucket(subj, N)`-partitioned triples table).
        Readers get partition pruning on the bucket column for free; on
        a real deployment the same call writes an Iceberg table and the
        conversion's groupBy(subj) becomes a bucket-local aggregation."""
        if resume and self.is_complete(stage, fingerprint):
            return self.read(stage)
        t0 = time.monotonic()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.stage_path(stage))
        with open(os.path.join(self.stage_path(stage), "_SCHEMA"), "w") as fh:
            fh.write(df.schema.json())
        if fingerprint is not None:
            with open(os.path.join(self.stage_path(stage), "_FINGERPRINT"), "w") as fh:
                fh.write(fingerprint)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._append_lineage(stage, wall_ms)
        return self.read(stage)

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_path())
