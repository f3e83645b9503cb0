"""Partition-spec evolution — Iceberg's signature metadata capability,
re-expressed over the plain-parquet lake layer.

The 100 TB problem: a table partitioned by day gets re-partitioned by
(day, zone) once it grows — but rewriting history is a multi-PB job.
Iceberg solves it in metadata: each data file remembers the partition spec
it was written under; new data uses the new spec; queries prune per-spec.
This module implements the same contract:

- every spec change starts a new ERA; data for era N lives under
  ``eras/era=N/`` partitioned by that era's columns;
- the spec history is a JSON sidecar (``_partition_specs.json``) — the
  analog of Iceberg's spec list in table metadata;
- ``read()`` unions the era scans BY NAME (all eras share the logical
  schema; partition columns are data columns too, so nothing is lost);
- predicate pushdown degrades gracefully per era: a filter on a column
  that is a partition column in era N prunes directories there
  (PartitionFilters) and falls back to row-group stats in eras where it
  is a plain column — exactly Iceberg's behavior, pinned by plan
  assertions in tests/test_partevo.py.

Like lake.py, all driver-side file metadata goes through the Hadoop
FileSystem wrapper (fs.py) so the layout works on file:// and s3a:// alike.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .fs import LakeFS


class PartitionEvolvingTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.fs = LakeFS(spark, path)

    @property
    def _spec_path(self) -> str:
        return os.path.join(self.path, "_partition_specs.json")

    def specs(self) -> list[list[str]]:
        """Spec history: specs()[era] = partition columns of that era."""
        if not self.fs.exists(self._spec_path):
            return []
        return json.loads(self.fs.read_text(self._spec_path))

    def current_spec(self) -> list[str]:
        history = self.specs()
        if not history:
            raise ValueError("no partition spec set — call set_spec() first")
        return history[-1]

    def set_spec(self, partition_cols: list[str]) -> int:
        """Start a new era with the given partitioning. Returns the era id.
        Purely a metadata operation — no data moves (the Iceberg contract)."""
        history = self.specs()
        if history and history[-1] == list(partition_cols):
            return len(history) - 1
        history.append(list(partition_cols))
        self.fs.mkdirs(self.path)
        self.fs.write_text(self._spec_path, json.dumps(history))
        return len(history) - 1

    def _era_dir(self, era: int) -> str:
        return os.path.join(self.path, "eras", f"era={era}")

    def append(self, df: DataFrame) -> None:
        """Append under the CURRENT spec's era directory."""
        era = len(self.specs()) - 1
        cols = self.current_spec()
        writer = df.write.mode("append")
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(self._era_dir(era))

    def read(self) -> DataFrame:
        """Union of all era scans, aligned by name. Partition columns are
        restored as data columns by Spark's partition discovery, so every
        era yields the same logical schema."""
        out: DataFrame | None = None
        for era in range(len(self.specs())):
            d = self._era_dir(era)
            if not self.fs.is_dir(d):
                continue
            part = self.spark.read.parquet(d)
            out = part if out is None else out.unionByName(part)
        if out is None:
            raise ValueError("empty table")
        return out

    def era_read(self, era: int) -> DataFrame:
        return self.spark.read.parquet(self._era_dir(era))
