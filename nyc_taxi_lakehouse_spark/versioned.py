"""Versioned lake tables: snapshot isolation, time travel, VACUUM.

The reference gets these semantics from Iceberg (its tables are snapshot
trees on MinIO; SURVEY §1.1/§1.4); ``lake.py``'s LakeTable deliberately
covers only the *current-state* contract (append / delete / merge) over
plain parquet. This module adds the log-structured half — the Delta/Iceberg
commit model — natively:

- every mutation is a **commit**: data files are only ever ADDED (appends
  write fresh uniquely-named part files; deletes rewrite survivors as new
  files), and a JSON manifest ``_log/v{N}.json`` records the live file set,
  schema, and operation of each version;
- ``read(version=...)`` pins any historical snapshot (time travel — Delta's
  ``VERSION AS OF``): the scan lists nothing, it reads exactly the
  manifest's files with partition values parsed via basePath;
- readers are **snapshot-isolated** for free: a lazy plan over version N
  keeps working while later commits run, because no commit removes files;
- ``vacuum(retain_last=...)`` is the physical-deletion boundary (Delta
  VACUUM): drops files unreferenced by the retained manifests, then the
  expired manifests.

Scale posture: manifests are metadata-sized (one relative path per live
file — the thing Delta stores as add-actions); commits append one small
JSON object per mutation; no driver-side row data ever. The added-files
probe is one recursive listing of the table root per commit — on an object
store Delta replaces that with transaction-log bookkeeping, the documented
1:1 mapping. Single-writer, like every driver-side maintenance path here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fs import LakeFS
from .lake import TxnLedger
from .lake import ValidationError, _nullability_normalized


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency, Delta-protocol style): re-read the table and retry."""


class VersionedLakeTable(TxnLedger):
    """A partitioned parquet table with Delta-style versioned commits."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_cols: list[str] | None = None,
        stats_cols: list[str] | None = None,
    ):
        """``stats_cols``: numeric data columns whose per-file min/max are
        recorded in every commit's manifest (Iceberg manifest / Delta
        file-statistics semantics) and used by read(filters=...) to prune
        files before Spark ever sees them. Stats come from parquet footers
        (no data scan); at cluster scale the writer tasks would report
        them with the commit — the driver-side footer scrape here is the
        single-node stand-in for that protocol, not a table scan."""
        self.spark = spark
        self.path = path.rstrip("/")
        self.partition_cols = list(partition_cols or [])
        self.stats_cols = list(stats_cols or [])
        self.fs = LakeFS(spark, path)

    # -- commit log ---------------------------------------------------------

    @property
    def _log_dir(self) -> str:
        return os.path.join(self.path, "_log")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"v{version:09d}.json")

    def versions(self) -> list[int]:
        if not self.fs.is_dir(self._log_dir):
            return []
        out = []
        for name, is_dir, _ in self.fs.list(self._log_dir):
            if not is_dir and name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        p = self._manifest_path(version)
        if not self.fs.exists(p):
            have = self.versions()
            raise ValidationError(
                f"version {version} not available (log has {have}; "
                "older versions may have been vacuumed)"
            )
        return json.loads(self.fs.read_text(p))

    def history(self) -> list[dict]:
        """Operation ledger, oldest first (Delta DESCRIBE HISTORY)."""
        return [
            {k: m[k] for k in ("version", "op", "n_files")}
            for m in (self._manifest(v) for v in self.versions())
        ]

    # -- file probes --------------------------------------------------------

    def _data_files(self) -> set[str]:
        """All part files under the table root, as table-relative paths.
        One recursive walk; partition depth is the directory depth."""
        found: set[str] = set()

        def walk(rel: str) -> None:
            absdir = os.path.join(self.path, rel) if rel else self.path
            for name, is_dir, _ in self.fs.list(absdir):
                if name.startswith((".", "_")):
                    continue
                child = os.path.join(rel, name) if rel else name
                if is_dir:
                    walk(child)
                elif name.endswith(".parquet"):
                    found.add(child)

        if self.fs.is_dir(self.path):
            walk("")
        return found

    def _commit(
        self,
        op: str,
        live: set[str],
        schema: T.StructType,
        base: str | None = None,
        expected_version: int | None = None,
        constraints: dict[str, str] | None = None,
        column_mapping: dict[str, str] | None = None,
        retired_physical: list[str] | None = None,
        stats_override: dict | None = None,
        generated_cols: dict[str, str] | None = None,
    ) -> int:
        """``expected_version`` is the snapshot version this commit's live
        set was DERIVED from (None for callers that did not read state).
        The put-if-absent write targets exactly expected+1 — so a racer
        that committed in between makes THIS commit fail with
        ConcurrentCommitError instead of silently dropping the racer's
        files from the live set (the lost-update mode the concurrent
        stress test caught: recomputing latest_version() here let a
        read-modify-write land on a fresh version number while carrying a
        stale live set)."""
        if expected_version is None:
            expected_version = self.latest_version() or 0
        version = expected_version + 1
        self.fs.mkdirs(self._log_dir)
        manifest = {
            "version": version,
            "op": op,
            "n_files": len(live),
            "files": sorted(live),
            "schema": schema.jsonValue(),
            "partition_cols": self.partition_cols,
        }
        if base is not None:
            manifest["base"] = base
        # CHECK constraints, the column mapping, and the retired-physical
        # ledger travel in the manifest like the schema: every commit
        # carries the previous version's set forward unless the caller
        # overrides it explicitly.
        if constraints is None:
            constraints = self.check_constraints(expected_version or None)
        if constraints:
            manifest["constraints"] = constraints
        if column_mapping is None:
            column_mapping = self.column_mapping(expected_version or None)
        if column_mapping:
            manifest["column_mapping"] = column_mapping
        if generated_cols is None:
            generated_cols = self.generated_columns(expected_version or None)
        if generated_cols:
            manifest["generated_cols"] = generated_cols
        retired = retired_physical
        if retired is None and expected_version:
            try:
                retired = self._manifest(expected_version).get("retired_physical", [])
            except Exception:
                retired = []
        if retired:
            manifest["retired_physical"] = retired
        if stats_override is not None:
            if stats_override:
                manifest["stats"] = stats_override
        elif self.stats_cols:
            prev_stats: dict = {}
            if expected_version >= 1:
                try:
                    prev_stats = self._manifest(expected_version).get("stats", {})
                except Exception:
                    prev_stats = {}
            stats = {}
            for f in manifest["files"]:
                if f in prev_stats:
                    stats[f] = prev_stats[f]  # carried-over file, stats valid
                else:
                    s = self._footer_stats(f)
                    if s:
                        stats[f] = s
            manifest["stats"] = stats
        # Optimistic concurrency control (Delta protocol): the manifest for
        # version N is created put-if-absent. A concurrent writer that
        # committed N first wins; this writer gets ConcurrentCommitError
        # instead of silently overwriting the log — callers re-read the
        # table and retry their transaction against the new snapshot.
        try:
            self.fs.write_text_exclusive(
                self._manifest_path(version), json.dumps(manifest)
            )
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} at {self.path} was committed by a "
                "concurrent writer; re-read and retry"
            ) from None
        return version

    def check_constraints(self, version: int | None = None) -> dict[str, str]:
        """The CHECK constraints in force as of ``version`` (default
        latest): name -> SQL predicate. Empty for an empty table."""
        v = self.latest_version() if version is None else version
        if not v:
            return {}
        try:
            return dict(self._manifest(v).get("constraints", {}))
        except Exception:
            return {}

    def add_check_constraint(self, name: str, predicate: str) -> int:
        """Delta's ALTER TABLE ADD CONSTRAINT ... CHECK: validate the
        EXISTING data satisfies the predicate (one scan — a constraint
        that current rows violate must be rejected, or history would lie),
        then commit a data-identical version whose manifest carries the
        constraint; every later append enforces it during the staging
        write. SQL CHECK semantics: a row violates only when the predicate
        evaluates to FALSE — NULL passes (add an IS NOT NULL conjunct for
        not-null enforcement)."""
        latest = self.latest_version()
        if latest is None:
            raise ValidationError("add_check_constraint: empty table")
        cons = self.check_constraints(latest)
        if name in cons:
            raise ValidationError(f"constraint {name!r} already exists")
        bad = (
            self.read(latest)
            .where(F.coalesce(~F.expr(predicate), F.lit(False)))
            .limit(1)
            .count()
        )
        if bad:
            raise ValidationError(
                f"add_check_constraint({name!r}): existing rows violate "
                f"({predicate})"
            )
        m = self._manifest(latest)
        cons[name] = predicate
        return self._commit(
            "add_constraint",
            set(m["files"]),
            T.StructType.fromJson(m["schema"]),
            expected_version=latest,
            constraints=cons,
        )

    def drop_check_constraint(self, name: str) -> int:
        latest = self.latest_version()
        if latest is None:
            raise ValidationError("drop_check_constraint: empty table")
        cons = self.check_constraints(latest)
        if name not in cons:
            raise ValidationError(f"constraint {name!r} does not exist")
        del cons[name]
        m = self._manifest(latest)
        return self._commit(
            "drop_constraint",
            set(m["files"]),
            T.StructType.fromJson(m["schema"]),
            expected_version=latest,
            constraints=cons,
        )

    def _constraint_metrics(self) -> dict:
        """Per-constraint violation counters as aggregate Columns — ridden
        on the staging write's Observation, so enforcement costs zero
        extra passes."""
        return {
            f"__check__{n}": F.sum(
                F.coalesce(~F.expr(p), F.lit(False)).cast("long")
            )
            for n, p in self.check_constraints().items()
        }

    def generated_columns(self, version: int | None = None) -> dict[str, str]:
        """Generated columns in force as of ``version``: name -> SQL
        generation expression (Delta GENERATED ALWAYS AS)."""
        v = self.latest_version() if version is None else version
        if not v:
            return {}
        try:
            return dict(self._manifest(v).get("generated_cols", {}))
        except Exception:
            return {}

    def add_generated_column(self, name: str, expr: str, dtype: str) -> int:
        """Delta's GENERATED ALWAYS AS: a metadata-only commit adding
        ``name`` (DDL type ``dtype``) computed as ``expr`` over the other
        columns. Rows in existing files read NULL for it (they predate the
        column — standard schema-evolution semantics); every later append
        either derives the column automatically (batch doesn't carry it)
        or validates the provided values match the expression null-safely
        and rejects the batch otherwise."""
        latest = self.latest_version()
        if latest is None:
            raise ValidationError("add_generated_column: empty table")
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        if name in [f.name for f in schema.fields]:
            raise ValidationError(f"add_generated_column: {name!r} exists")
        gen = self.generated_columns(latest)
        gen[name] = expr
        new_schema = T.StructType(
            list(schema.fields)
            + [T.StructField(name, T._parse_datatype_string(dtype), True)]
        )
        return self._commit(
            "add_generated_column",
            set(m["files"]),
            new_schema,
            expected_version=latest,
            generated_cols=gen,
        )

    def _apply_generated(self, df: DataFrame) -> tuple[DataFrame, dict]:
        """Derive absent generated columns (cast to their declared table
        type); emit null-safe mismatch counters (ridden on the write
        Observation) for provided ones."""
        gen = self.generated_columns()
        checks: dict = {}
        if not gen:
            return df, checks
        latest = self.latest_version()
        types = {
            f.name: f.dataType
            for f in T.StructType.fromJson(self._manifest(latest)["schema"]).fields
        }
        for name, expr in gen.items():
            if name in df.columns:
                checks[f"__gen__{name}"] = F.sum(
                    F.expr(f"NOT (({name}) <=> ({expr}))").cast("long")
                )
            else:
                df = df.withColumn(name, F.expr(expr).cast(types[name]))
        return df, checks

    # -- column mapping (Delta column-mapping semantics) ---------------------

    def column_mapping(self, version: int | None = None) -> dict[str, str]:
        """logical column name -> physical parquet column name as of
        ``version`` (default latest). Identity when never renamed."""
        v = self.latest_version() if version is None else version
        if not v:
            return {}
        try:
            return dict(self._manifest(v).get("column_mapping", {}))
        except Exception:
            return {}

    def _phys(self, name: str, mapping: dict[str, str]) -> str:
        return mapping.get(name, name)

    def _physical_schema(
        self, schema: T.StructType, mapping: dict[str, str]
    ) -> T.StructType:
        return T.StructType(
            [
                T.StructField(self._phys(f.name, mapping), f.dataType, f.nullable)
                for f in schema.fields
            ]
        )

    def rename_column(self, old: str, new: str) -> int:
        """Delta's ALTER TABLE RENAME COLUMN under column mapping: a
        METADATA-ONLY commit — no data file is rewritten; the logical
        schema renames the field while the mapping keeps pointing at the
        original physical parquet column, so every snapshot (old and new)
        still reads every file. Partition columns are refused (their
        physical identity is baked into the hive directory layout), as is
        renaming a column referenced by a CHECK constraint (the stored
        predicate text would silently break)."""
        import re

        latest = self.latest_version()
        if latest is None:
            raise ValidationError("rename_column: empty table")
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValidationError(f"rename_column: no column {old!r}")
        if new in names:
            raise ValidationError(f"rename_column: {new!r} already exists")
        if old in self.partition_cols:
            raise ValidationError(
                f"rename_column: {old!r} is a partition column (its physical "
                "name is the hive directory layout)"
            )
        for cname, pred in self.check_constraints(latest).items():
            if re.search(rf"\b{re.escape(old)}\b", pred):
                raise ValidationError(
                    f"rename_column: column {old!r} is referenced by CHECK "
                    f"constraint {cname!r} — drop it first"
                )
        for gname, gexpr in self.generated_columns(latest).items():
            if gname == old or re.search(rf"\b{re.escape(old)}\b", gexpr):
                raise ValidationError(
                    f"rename_column: column {old!r} is a generated column or "
                    f"referenced by generated column {gname!r}"
                )
        mapping = self.column_mapping(latest)
        mapping[new] = mapping.pop(old, old)
        new_schema = T.StructType(
            [
                T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        stats_fix = None
        if old in self.stats_cols:
            self.stats_cols = [new if c == old else c for c in self.stats_cols]
            stats_fix = (old, new)
        version = self._commit_mapped(
            "rename_column", m, new_schema, mapping, latest, stats_fix
        )
        return version

    def drop_column(self, name: str) -> int:
        """Delta's ALTER TABLE DROP COLUMN under column mapping: metadata-
        only — the physical column stays in the old files (serving earlier
        snapshots) but the logical schema and mapping forget it; its
        physical name is RETIRED so a later re-added column of the same
        logical name gets a fresh physical identity instead of
        resurrecting the dropped values from old files."""
        import re

        latest = self.latest_version()
        if latest is None:
            raise ValidationError("drop_column: empty table")
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        if name not in [f.name for f in schema.fields]:
            raise ValidationError(f"drop_column: no column {name!r}")
        if name in self.partition_cols:
            raise ValidationError(f"drop_column: {name!r} is a partition column")
        for cname, pred in self.check_constraints(latest).items():
            if re.search(rf"\b{re.escape(name)}\b", pred):
                raise ValidationError(
                    f"drop_column: column {name!r} is referenced by CHECK "
                    f"constraint {cname!r} — drop it first"
                )
        gen = self.generated_columns(latest)
        for gname, gexpr in gen.items():
            if gname != name and re.search(rf"\b{re.escape(name)}\b", gexpr):
                raise ValidationError(
                    f"drop_column: column {name!r} is referenced by generated "
                    f"column {gname!r} — drop it first"
                )
        gen.pop(name, None)  # dropping a generated column retires its rule
        mapping = self.column_mapping(latest)
        retired = list(m.get("retired_physical", []))
        retired.append(self._phys(name, mapping))
        mapping.pop(name, None)
        new_schema = T.StructType([f for f in schema.fields if f.name != name])
        if name in self.stats_cols:
            self.stats_cols = [c for c in self.stats_cols if c != name]
        return self._commit_mapped(
            "drop_column", m, new_schema, mapping, latest, None, retired, gen
        )

    def _commit_mapped(
        self,
        op: str,
        m: dict,
        new_schema: T.StructType,
        mapping: dict[str, str],
        latest: int,
        stats_fix: tuple[str, str] | None = None,
        retired: list[str] | None = None,
        generated_cols: dict[str, str] | None = None,
    ) -> int:
        """Metadata-only commit helper for rename/drop: same live set, new
        logical schema + mapping (+ retired-physical ledger); per-file
        stats are carried over with their logical keys renamed in place
        (the physical footers are untouched by a metadata-only commit)."""
        stats = dict(m.get("stats", {}))
        if stats_fix:
            old, new = stats_fix
            stats = {
                f: {(new if c == old else c): v for c, v in s.items()}
                for f, s in stats.items()
            }
        return self._commit(
            op,
            set(m["files"]),
            new_schema,
            expected_version=latest,
            constraints=self.check_constraints(latest),
            column_mapping=mapping,
            retired_physical=(
                retired if retired is not None else list(m.get("retired_physical", []))
            ),
            stats_override=stats,
            generated_cols=generated_cols,
        )

    def _read_physical(self, abs_files: list[str], schema: T.StructType) -> DataFrame:
        """Read specific data files (physical column names) back as the
        LOGICAL schema — the rewrite paths' (compact/cluster) twin of
        read()'s aliasing."""
        mapping = self.column_mapping()
        df = (
            self.spark.read.schema(self._physical_schema(schema, mapping))
            .option("basePath", self.path)
            .parquet(*abs_files)
        )
        if mapping:
            df = df.select(
                *[
                    F.col(self._phys(f.name, mapping)).alias(f.name)
                    for f in schema.fields
                ]
            )
        return df

    def _fresh_physical(self, logical: str, latest: int | None) -> str:
        """Physical name for a NEW logical column: the logical name itself
        unless that physical identity is in use or retired (a re-added
        column must not resurrect a dropped column's values)."""
        if not latest:
            return logical
        m = self._manifest(latest)
        mapping = self.column_mapping(latest)
        used = set(mapping.values()) | set(m.get("retired_physical", []))
        schema = T.StructType.fromJson(m["schema"])
        used |= {self._phys(f.name, mapping) for f in schema.fields}
        if logical not in used:
            return logical
        import uuid as _uuid

        return f"{logical}_{_uuid.uuid4().hex[:8]}"

    def _footer_stats(self, rel: str) -> dict[str, list]:
        """Per-column [min, max] for one data file, read from the parquet
        FOOTER (row-group statistics aggregated across row groups) — no
        data pages are touched. Only numeric physical types are trusted:
        parquet writers may truncate binary/string min/max, which makes an
        upper bound understate and pruning unsound for them."""
        import pyarrow.parquet as pq

        path = rel if os.path.isabs(rel) else os.path.join(self.path, rel)
        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            return {}
        mapping = self.column_mapping()
        logical_of = {self._phys(c, mapping): c for c in self.stats_cols}
        wanted = set(logical_of)
        out: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                pname = col.path_in_schema
                if pname not in wanted or col.physical_type not in (
                    "INT32",
                    "INT64",
                    "FLOAT",
                    "DOUBLE",
                ):
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    return {}  # any gap makes the file unprunable — be safe
                name = logical_of[pname]  # stats are keyed by LOGICAL name
                if name in out:
                    out[name][0] = min(out[name][0], st.min)
                    out[name][1] = max(out[name][1], st.max)
                else:
                    out[name] = [st.min, st.max]
        return out if set(out) == set(self.stats_cols) else {}

    # -- reads --------------------------------------------------------------

    def prune_files(
        self,
        filters: list[tuple[str, float, float]],
        version: int | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-level data skipping: (surviving relative files, total
        live files) for conjunctive closed-range ``filters`` [(col, lo,
        hi), ...] against the committed per-file min/max stats. A file
        without stats for a filtered column is kept (pruning must never
        drop a possible match). With a z-ordered layout (cluster()) every
        filtered dimension prunes; with a single-column sort only that
        column does — q_zorder_layout is the audit of exactly this."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise ValidationError(f"empty versioned table at {self.path}")
        m = self._manifest(v)
        stats = m.get("stats", {})
        kept = []
        for f in m["files"]:
            s = stats.get(f)
            keep = True
            if s:
                for col, lo, hi in filters:
                    if col in s and (s[col][0] > hi or s[col][1] < lo):
                        keep = False
                        break
            if keep:
                kept.append(f)
        return kept, len(m["files"])

    def read(
        self,
        version: int | None = None,
        filters: list[tuple[str, float, float]] | None = None,
    ) -> DataFrame:
        """The table as of ``version`` (default: latest). Reads exactly the
        manifest's files — dead files from later deletes are invisible, and
        pre-evolution files yield NULL for later-added columns.

        ``filters`` [(col, lo, hi), ...] prunes files via the manifest's
        per-file min/max stats BEFORE Spark plans the scan (Iceberg/Delta
        data skipping) and then applies the same predicates as WHERE
        clauses, so the result equals a full-scan filter — just cheaper.
        """
        v = self.latest_version() if version is None else version
        if v is None:
            raise ValidationError(f"empty versioned table at {self.path}")
        m = self._manifest(v)
        schema = T.StructType.fromJson(m["schema"])
        rel_files = m["files"]
        if filters:
            rel_files, _total = self.prune_files(filters, version=v)
        # Shallow-clone manifests (clone_to) list ABSOLUTE paths into the
        # source table; ordinary manifests list paths relative to this
        # table's root. A post-clone append may mix both.
        files = [
            f if os.path.isabs(f) else os.path.join(self.path, f)
            for f in rel_files
        ]
        if not files:
            return self.spark.createDataFrame([], schema)
        # Column mapping: files are read under their PHYSICAL names (the
        # names renames never touch) and aliased back to the version's
        # logical schema — the metadata-only rename/drop contract.
        mapping = self.column_mapping(v)
        reader = self.spark.read.schema(self._physical_schema(schema, mapping))
        if self.partition_cols:
            bases = {self.path if not os.path.isabs(f) else m.get("base", "")
                     for f in rel_files}
            if len(bases) > 1 or "" in bases:
                raise ValidationError(
                    "partitioned shallow clone with mixed file roots — "
                    "compact() the clone to re-home its files first"
                )
            reader = reader.option("basePath", bases.pop())
        df = reader.parquet(*files)
        if mapping:
            df = df.select(
                *[
                    F.col(self._phys(f.name, mapping)).alias(f.name)
                    for f in schema.fields
                ]
            )
        if filters:
            for col, lo, hi in filters:
                df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        return df

    # -- commits ------------------------------------------------------------

    def _staged_write(
        self,
        df: DataFrame,
        subdir: str = "",
        partitioned: bool | None = None,
        mapping: dict[str, str] | None = None,
    ) -> set[str]:
        """Write df's part files through a PRIVATE staging directory, then
        move them into the table layout; returns the relative paths added.

        The naive write-then-diff (snapshot _data_files before/after a
        mode("append") write straight into the table) has two concurrency
        defects the OCC log cannot fix: concurrent jobs share Hadoop's
        <table>/_temporary staging (one job's commit deletes the other's
        attempts — observed as lost appends in the stress test), and the
        set diff attributes a racing writer's files to this commit. A
        per-commit staging dir (Delta writes files the same way: uniquely
        named, invisible until the log commit) gives each writer private
        staging and an EXACT added-file list."""
        import uuid as _uuid

        # Data files always carry PHYSICAL column names; callers work in
        # logical names (df comes from read() or the user). `mapping` lets
        # append() include physical identities for columns added in this
        # same commit.
        eff = self.column_mapping() if mapping is None else mapping
        if eff:
            df = df.select(
                *[F.col(c).alias(eff.get(c, c)) for c in df.columns]
            )
        stage = os.path.join(self.path, "_staging", _uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        use_partitioning = (
            bool(self.partition_cols) if partitioned is None else partitioned
        )
        if use_partitioning:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(stage)

        added: set[str] = set()

        def walk(rel: str) -> None:
            for name, is_dir, _size in self.fs.list(os.path.join(stage, rel)):
                r = os.path.join(rel, name) if rel else name
                if is_dir:
                    walk(r)
                elif not name.startswith("_") and not name.startswith("."):
                    added.add(r)

        walk("")
        for rel in added:
            dest_rel = os.path.join(subdir, rel) if subdir else rel
            dest = os.path.join(self.path, dest_rel)
            parent = os.path.dirname(dest)
            if parent:
                self.fs.mkdirs(parent)
            if not self.fs.rename(os.path.join(stage, rel), dest):
                raise ValidationError(f"staged move failed: {rel} -> {dest_rel}")
        self.fs.delete(stage, recursive=True)
        self.spark.catalog.refreshByPath(self.path)
        return {os.path.join(subdir, r) if subdir else r for r in added}

    def _append_prep(
        self, df: DataFrame, merge_schema: bool
    ) -> tuple[T.StructType, set[str], int | None]:
        """Schema-merge validation shared by append/wap_append: returns the
        (possibly evolved) table schema, the previous live set, and the
        snapshot version the commit derives from."""
        latest = self.latest_version()
        if latest is not None:
            current_schema = T.StructType.fromJson(self._manifest(latest)["schema"])
            cur_by_name = {f.name: f for f in current_schema.fields}
            for f in df.schema.fields:
                have = cur_by_name.get(f.name)
                if have is not None and _nullability_normalized(
                    have.dataType
                ) != _nullability_normalized(f.dataType):
                    raise ValidationError(
                        f"append(merge_schema={merge_schema}): column {f.name!r} "
                        f"type conflict {have.dataType} vs {f.dataType}"
                    )
            new_fields = [f for f in df.schema.fields if f.name not in cur_by_name]
            if new_fields and not merge_schema:
                raise ValidationError(
                    f"append: new columns {[f.name for f in new_fields]} — pass "
                    "merge_schema=True to evolve the table schema"
                )
            schema = T.StructType(list(current_schema.fields) + new_fields)
            prev_live = set(self._manifest(latest)["files"])
        else:
            schema = df.schema
            prev_live = set()
        return schema, prev_live, latest

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Commit an append. Data lands as fresh uniquely-named part files in
        the normal partition layout; the new manifest = previous live set +
        added files. Returns the new version. CHECK constraints in force
        are enforced during the staging write (Observation — no extra
        pass); a violating batch is discarded before commit, Delta
        semantics."""
        df, gen_checks = self._apply_generated(df)
        schema, prev_live, latest = self._append_prep(df, merge_schema)
        mapping = self._mapping_with_new_cols(df, latest)
        checks = self._constraint_metrics() | gen_checks
        if checks:
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(obs, *[c.alias(k) for k, c in checks.items()])
        added = self._staged_write(df, mapping=mapping)
        if checks:
            observed = dict(obs.get)
            bad = {
                k.removeprefix("__check__").removeprefix("__gen__"): v
                for k, v in observed.items()
                if v and v > 0
            }
            if bad:
                for rel in added:
                    self.fs.delete(os.path.join(self.path, rel))
                raise ValidationError(
                    "append rejected by CHECK constraints / generated-"
                    f"column validation (staged files discarded): {bad}"
                )
        return self._commit(
            "append",
            prev_live | added,
            schema,
            expected_version=latest or 0,
            column_mapping=mapping,
        )

    def _mapping_with_new_cols(
        self, df: DataFrame, latest: int | None
    ) -> dict[str, str]:
        """The effective column mapping for an append: the committed
        mapping plus fresh physical identities for columns this batch
        introduces (schema evolution under column mapping)."""
        mapping = self.column_mapping(latest)
        if latest:
            prev = {
                f.name
                for f in T.StructType.fromJson(
                    self._manifest(latest)["schema"]
                ).fields
            }
        else:
            prev = set()
        for c in df.columns:
            if c not in prev and c not in mapping:
                phys = self._fresh_physical(c, latest)
                if phys != c:
                    mapping[c] = phys
        return mapping

    def wap_append(
        self,
        df: DataFrame,
        metrics: dict,
        audit,
        merge_schema: bool = False,
    ):
        """Write-Audit-Publish append (the Iceberg/Netflix WAP pattern) with
        ZERO-extra-pass metrics: an Observation rides the staging write
        job, so row counts / null counts / domain violations are measured
        while the data is being written — not by the count()-per-gate
        re-scans of validate_non_empty / null_profile, which each cost a
        full extra pass at 100 TB. ``metrics`` maps name -> aggregate
        Column (F.count/F.sum/...); ``audit`` is a callable taking the
        observed dict and returning a list of violation strings. Empty
        list -> the staged files are committed (publish) and
        (version, observed) returned; any violation -> the staged files
        are deleted, no commit is written (readers never saw them — the
        audit happens BEFORE publish, unlike a post-append delete), and
        ValidationError lists every violation."""
        from pyspark.sql import Observation

        df, gen_checks = self._apply_generated(df)
        schema, prev_live, latest = self._append_prep(df, merge_schema)
        mapping = self._mapping_with_new_cols(df, latest)
        all_metrics = dict(metrics) | self._constraint_metrics() | gen_checks
        obs = Observation()
        named = df.observe(obs, *[c.alias(k) for k, c in all_metrics.items()])
        added = self._staged_write(named, mapping=mapping)
        observed = dict(obs.get)
        check_fails = [
            f"CHECK {k.removeprefix('__check__').removeprefix('__gen__')}: "
            f"{v} violating rows"
            for k, v in observed.items()
            if k.startswith(("__check__", "__gen__")) and v and v > 0
        ]
        observed = {
            k: v
            for k, v in observed.items()
            if not k.startswith(("__check__", "__gen__"))
        }
        violations = check_fails + audit(observed)
        if violations:
            for rel in added:
                self.fs.delete(os.path.join(self.path, rel))
            raise ValidationError(
                "wap_append audit failed (staged files discarded, nothing "
                "published): " + "; ".join(violations)
            )
        version = self._commit(
            "append",
            prev_live | added,
            schema,
            expected_version=latest or 0,
            column_mapping=mapping,
        )
        return version, observed

    def delete_where(self, predicate: str) -> int:
        """Commit a DELETE. Survivors of affected partitions are rewritten as
        NEW files (append-mode write — nothing is physically removed, so
        every earlier snapshot and any in-flight reader keeps working); the
        manifest drops the affected partitions' old files. Partition-bounded
        exactly like LakeTable.delete_where. Returns the new version."""
        latest = self.latest_version()
        if latest is None:
            raise ValidationError(f"empty versioned table at {self.path}")
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        live = set(m["files"])
        current = self.read(latest)
        keep_pred = ~F.coalesce(F.expr(predicate), F.lit(False))
        if self.partition_cols:
            affected = current.filter(predicate)
            parts = [
                tuple(r)
                for r in affected.select(*self.partition_cols).distinct().collect()
            ]
            if not parts:
                return self._commit("delete_where(noop)", live, schema, expected_version=latest)
            prefixes = tuple(
                _partition_prefix(self.partition_cols, p) for p in parts
            )
            dead = {f for f in live if f.startswith(prefixes)}
            from .lake import _partition_filter

            cond = _partition_filter(self.partition_cols, parts)
            survivors = current.filter(cond).filter(keep_pred)
        else:
            dead = set(live)
            survivors = current.filter(keep_pred)
        added = self._staged_write(survivors)
        return self._commit(
            "delete_where", (live - dead) | added, schema, expected_version=latest
        )

    def update_where(self, predicate: str, set_exprs: dict[str, str]) -> int:
        """Commit an UPDATE ... SET (Delta UPDATE semantics): rows matching
        ``predicate`` get each column in ``set_exprs`` recomputed from its
        SQL expression (evaluated against the PRE-update row, all
        assignments simultaneous, standard UPDATE semantics); unmatched
        rows pass through byte-identical. Partition-bounded like
        delete_where — only partitions containing a match are rewritten,
        as NEW files, so earlier snapshots keep reading. CHECK constraints
        in force are enforced on the rewritten rows (the update must not
        smuggle in violations an append would have rejected); generated
        columns are recomputed when their sources change is the caller's
        concern — assigning a generated column directly is refused.
        Partition columns cannot be assigned (that is a MERGE/move, not an
        in-place update). Returns the new version."""
        latest = self.latest_version()
        if latest is None:
            raise ValidationError(f"empty versioned table at {self.path}")
        for c in set_exprs:
            if c in self.partition_cols:
                raise ValidationError(
                    f"update_where: cannot assign partition column {c!r}"
                )
            if c in self.generated_columns(latest):
                raise ValidationError(
                    f"update_where: {c!r} is GENERATED ALWAYS AS — it cannot "
                    "be assigned directly"
                )
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        names = [f.name for f in schema.fields]
        for c in set_exprs:
            if c not in names:
                raise ValidationError(f"update_where: no column {c!r}")
        live = set(m["files"])
        current = self.read(latest)
        match = F.coalesce(F.expr(predicate), F.lit(False))
        if self.partition_cols:
            parts = [
                tuple(r)
                for r in current.filter(match)
                .select(*self.partition_cols)
                .distinct()
                .collect()
            ]
            if not parts:
                return self._commit(
                    "update_where(noop)", live, schema, expected_version=latest
                )
            prefixes = tuple(_partition_prefix(self.partition_cols, p) for p in parts)
            dead = {f for f in live if f.startswith(prefixes)}
            from .lake import _partition_filter

            scope = current.filter(_partition_filter(self.partition_cols, parts))
        else:
            dead = set(live)
            scope = current
        # Simultaneous assignment: every SET expression evaluates against
        # the pre-update row (one select, not chained withColumns).
        updated = scope.select(
            *[
                F.when(match, F.expr(set_exprs[c]).cast(schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_exprs
                else F.col(c)
                for c in names
            ]
        )
        checks = self._constraint_metrics()
        if checks:
            from pyspark.sql import Observation

            obs = Observation()
            updated = updated.observe(
                obs, *[c.alias(k) for k, c in checks.items()]
            )
        added = self._staged_write(updated)
        if checks:
            bad = {
                k.removeprefix("__check__"): v
                for k, v in dict(obs.get).items()
                if v and v > 0
            }
            if bad:
                for rel in added:
                    self.fs.delete(os.path.join(self.path, rel))
                raise ValidationError(
                    f"update_where rejected by CHECK constraints: {bad}"
                )
        return self._commit(
            "update_where", (live - dead) | added, schema, expected_version=latest
        )

    def merge_upsert(
        self,
        updates: DataFrame,
        keys: list[str],
        order_col: str | None = None,
        delete_col: str | None = None,
    ) -> int:
        """Commit a keyed MERGE (Delta MERGE WHEN MATCHED UPDATE/DELETE,
        NOT MATCHED INSERT) with last-write-wins by ``order_col`` within the
        batch. Affected partitions' surviving rows + inserts are written as
        NEW files; the manifest swaps those partitions' file sets. Earlier
        snapshots stay readable — each CDC batch becomes one time-travelable
        version. Returns the new version."""
        from pyspark.sql import Window

        if order_col:
            w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
            updates = (
                updates.withColumn("__rn", F.row_number().over(w))
                .filter("__rn = 1")
                .drop("__rn")
            )
        if delete_col:
            inserts = updates.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        else:
            inserts = updates
        all_keys = updates.select(*keys)
        latest = self.latest_version()
        if latest is None:
            return self.append(inserts)
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        live = set(m["files"])
        current = self.read(latest)
        # Align the insert side to the table schema (drops batch-only
        # bookkeeping columns like the order_col).
        inserts = inserts.select(*[f.name for f in schema.fields])
        if self.partition_cols:
            pcols = self.partition_cols
            touched = (
                current.join(all_keys, keys, "left_semi")
                .select(*pcols)
                .unionByName(inserts.select(*pcols))
                .distinct()
            )
            parts = [tuple(r) for r in touched.collect()]
            if not parts:
                return self._commit("merge_upsert(noop)", live, schema, expected_version=latest)
            from .lake import _partition_filter

            prefixes = tuple(_partition_prefix(pcols, p) for p in parts)
            dead = {f for f in live if f.startswith(prefixes)}
            cond = _partition_filter(pcols, parts)
            merged = (
                current.filter(cond)
                .join(all_keys, keys, "left_anti")
                .unionByName(inserts)
            )
        else:
            dead = set(live)
            merged = current.join(all_keys, keys, "left_anti").unionByName(inserts)
        added = self._staged_write(merged)
        return self._commit(
            "merge_upsert", (live - dead) | added, schema, expected_version=latest
        )

    # -- maintenance --------------------------------------------------------

    def compact(self, target_file_bytes: int = 128 << 20) -> int:
        """Commit an OPTIMIZE: rewrite the current live set as bin-packed
        files (coalesced toward the target size) and commit the new layout.
        Unlike LakeTable.compact this is non-destructive — the fragmented
        files stay on disk serving older snapshots until vacuum(); readers
        of any version are never disturbed (Delta OPTIMIZE semantics: a
        data-identical commit). Returns the new version, or -1 if the table
        is already compact (no commit written)."""
        import math

        latest = self.latest_version()
        if latest is None:
            return -1
        m = self._manifest(latest)
        live = set(m["files"])
        # Group live files by partition directory; a partition is worth
        # rewriting only if it has more files than its data needs.
        by_dir: dict[str, list[str]] = {}
        for f in live:
            by_dir.setdefault(os.path.dirname(f), []).append(f)
        sizes = {}
        for d, files in by_dir.items():
            absdir = os.path.join(self.path, d) if d else self.path
            listing = {name: size for name, is_dir, size in self.fs.list(absdir) if not is_dir}
            sizes[d] = {f: listing.get(os.path.basename(f), 0) for f in files}
        schema = T.StructType.fromJson(m["schema"])
        new_live = set(live)
        rewrote = False
        for d, files in by_dir.items():
            total = sum(sizes[d].values())
            want = max(1, math.ceil(total / target_file_bytes))
            if len(files) <= want:
                continue
            rewrote = True
            abs_files = [os.path.join(self.path, f) for f in files]
            df = self._read_physical(abs_files, schema)
            # Stage into the partition directory (values are fixed within
            # it), keeping the hive layout without re-shuffling.
            added = self._staged_write(
                df.coalesce(want).drop(*self.partition_cols),
                subdir=d,
                partitioned=False,
            )
            new_live = (new_live - set(files)) | added
        if not rewrote:
            return -1
        self.spark.catalog.refreshByPath(self.path)
        return self._commit("compact", new_live, schema, expected_version=latest)

    def cluster(
        self,
        zorder_by: list[str],
        bits: int = 12,
        target_file_bytes: int = 128 << 20,
        min_files: int = 1,
    ) -> int:
        """Commit an OPTIMIZE ... ZORDER BY: rewrite the live set with rows
        range-partitioned and sorted by the Morton interleave of the named
        numeric columns, so file-level min/max statistics prune scans on
        EVERY zorder dimension (the q_zorder_layout audit measures why).
        Hive-partitioned tables are clustered within each partition
        directory, Delta-style. Non-destructive like compact(): old files
        keep serving older snapshots until vacuum(). Scale shape: one
        bounded 2-scalar-per-column collect for the min/max bounds, then
        repartitionByRange on the z-code (sampled range boundaries — no
        global sort) + sortWithinPartitions; the z expression is JVM-side
        bit arithmetic inside codegen. Returns the new version, or -1 if
        the table is empty."""
        import math

        from .operators.zorder import minmax_scale, zorder_column

        latest = self.latest_version()
        if latest is None:
            return -1
        m = self._manifest(latest)
        schema = T.StructType.fromJson(m["schema"])
        live = set(m["files"])
        by_dir: dict[str, list[str]] = {}
        for f in live:
            by_dir.setdefault(os.path.dirname(f), []).append(f)
        new_live = set(live)
        rewrote = False
        for d, files in by_dir.items():
            abs_files = [os.path.join(self.path, f) for f in files]
            df = self._read_physical(abs_files, schema).drop(*self.partition_cols)
            absdir = os.path.join(self.path, d) if d else self.path
            listing = {
                name: size for name, is_dir, size in self.fs.list(absdir) if not is_dir
            }
            total = sum(listing.get(os.path.basename(f), 0) for f in files)
            want = max(min_files, math.ceil(total / target_file_bytes))
            aggs = []
            for c in zorder_by:
                aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
            bounds = df.agg(*aggs).collect()[0]
            cols = [
                minmax_scale(
                    F.col(c),
                    F.lit(bounds[f"mn_{c}"]),
                    F.lit(bounds[f"mx_{c}"]),
                    bits,
                )
                for c in zorder_by
            ]
            clustered = (
                df.withColumn("__z", zorder_column(cols, bits))
                .repartitionByRange(want, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
            added = self._staged_write(clustered, subdir=d, partitioned=False)
            new_live = (new_live - set(files)) | added
            rewrote = True
        if not rewrote:
            return -1
        self.spark.catalog.refreshByPath(self.path)
        return self._commit("zorder", new_live, schema, expected_version=latest)

    def restore(self, version: int) -> int:
        """Delta RESTORE TABLE ... TO VERSION AS OF n: commit a NEW version
        whose manifest is the target version's file list — a zero-copy
        rollback that PRESERVES history (the bad versions stay readable
        until vacuum, exactly Delta's semantics; a destructive log rewind
        would break time travel and concurrent readers). Refuses if any
        restored file has been vacuumed away in the meantime."""
        head = self.latest_version()
        m = self._manifest(version)
        missing = [
            f for f in m["files"]
            if not self.fs.exists(os.path.join(self.path, f))
        ]
        if missing:
            raise ValidationError(
                f"cannot restore to version {version}: {len(missing)} data "
                f"file(s) were vacuumed (e.g. {missing[0]}); restore is only "
                "possible within the vacuum retention window"
            )
        return self._commit(
            "restore",
            set(m["files"]),
            T.StructType.fromJson(m["schema"]),
            expected_version=head,
        )

    def clone_to(self, dest_path: str) -> "VersionedLakeTable":
        """Zero-copy SHALLOW CLONE of the latest snapshot (Delta CLONE):
        the clone gets its own commit log whose first manifest references
        the source's live data files by absolute path — no data moves.
        Writes to the clone land under the clone's root and never touch the
        source; the source evolving (appends/deletes) never changes the
        clone (its manifest pins the file set). The one shared-fate hazard
        is the same as Delta's: VACUUMing the SOURCE can physically remove
        files a shallow clone still references — deep-copy (compact) the
        clone before vacuuming a cloned source."""
        latest = self.latest_version()
        if latest is None:
            raise ValidationError(f"cannot clone empty table at {self.path}")
        m = self._manifest(latest)
        src_base = m.get("base", self.path)
        files_abs = {
            f if os.path.isabs(f) else os.path.join(self.path, f)
            for f in m["files"]
        }
        clone = VersionedLakeTable(
            self.spark, dest_path, list(m.get("partition_cols") or [])
        )
        if clone.versions():
            raise ValidationError(f"clone destination {dest_path} not empty")
        clone._commit(
            f"clone(shallow from {self.path}@v{latest})",
            files_abs,
            T.StructType.fromJson(m["schema"]),
            base=src_base,
        )
        return clone

    def orphans(self, retain_last: int = 1) -> set[str]:
        """Table-relative data files on disk that no retained manifest
        references (failed writes, vacuum candidates). Pure report — the
        audit half of vacuum()."""
        vs = self.versions()
        if not vs:
            return set()
        referenced: set[str] = set()
        for v in vs[-max(1, retain_last):]:
            referenced |= set(self._manifest(v)["files"])
        return self._data_files() - referenced

    def vacuum(self, retain_last: int = 1) -> int:
        """Physically delete files unreferenced by the newest ``retain_last``
        manifests, then drop the expired manifests (Delta VACUUM + log
        retention in one). Also clears ``_staging`` leftovers from crashed
        commits (underscore-prefixed, so invisible to readers and to the
        orphan walk) — like Delta's VACUUM, this must not run concurrently
        with in-flight writers, whose private staging dirs live there.
        Returns the number of data files removed."""
        vs = self.versions()
        if not vs:
            return 0
        removed = 0
        for f in self.orphans(retain_last):
            if self.fs.delete(os.path.join(self.path, f)):
                removed += 1
        for v in vs[: -max(1, retain_last)]:
            self.fs.delete(self._manifest_path(v))
        staging = os.path.join(self.path, "_staging")
        if self.fs.exists(staging):
            self.fs.delete(staging, recursive=True)
        self.spark.catalog.refreshByPath(self.path)
        return removed


def _partition_prefix(pcols: list[str], part: tuple) -> str:
    """Relative path prefix of one partition's directory (hive layout).
    Mirrors lake._partition_subdir's encoding, including the NULL dir."""
    from .lake import _partition_subdir

    return _partition_subdir(pcols, part) + "/"
