"""Hadoop FileSystem wrapper — object-store-safe table maintenance.

LakeTable's maintenance paths (existence probes, the schema sidecar, compact,
partition-directory drops, staging cleanup) run through the JVM Hadoop
FileSystem API instead of os/shutil, so identical code drives file:// here
and s3a:// / abfs:// / hdfs:// on a real cluster — the operational surface
Delta's OPTIMIZE/VACUUM provide natively (reference delegates this to
Iceberg's table maintenance; SURVEY §1.4). Driver-side work stays metadata-
sized: directory statuses and a one-file JSON sidecar, never row data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class LakeFS:
    """Thin py4j facade over org.apache.hadoop.fs.FileSystem, resolved from
    the table's own path so each table may live on a different store."""

    def __init__(self, spark: SparkSession, base: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(base).getFileSystem(self._conf)

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._path(path)))

    def is_dir(self, path: str) -> bool:
        p = self._path(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def list(self, path: str) -> list[tuple[str, bool, int]]:
        """Child statuses as (name, is_dir, size) — one listStatus RPC."""
        return [
            (s.getPath().getName(), bool(s.isDirectory()), int(s.getLen()))
            for s in self._fs.listStatus(self._path(path))
        ]

    def delete(self, path: str, recursive: bool = False) -> bool:
        return bool(self._fs.delete(self._path(path), recursive))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._path(src), self._path(dst)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._path(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        """Create-or-overwrite a small text file (single PUT on object
        stores — effectively atomic there; local FS overwrite in place)."""
        out = self._fs.create(self._path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def write_text_exclusive(self, path: str, text: str) -> None:
        """Create a small text file, FAILING if it already exists (Hadoop
        create(overwrite=false)) — the put-if-absent primitive optimistic
        concurrency control needs for commit-log manifests. Raises
        FileExistsError on collision."""
        try:
            out = self._fs.create(self._path(path), False)
        except Exception as e:  # py4j-wrapped FileAlreadyExistsException
            if "exist" in str(e).lower():
                raise FileExistsError(path) from None
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
