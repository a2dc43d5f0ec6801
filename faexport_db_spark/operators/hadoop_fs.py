"""Thin py4j wrapper over org.apache.hadoop.fs.FileSystem.

Maintenance jobs (compaction) and index metadata need driver-side file
listing, rename, delete, and small-text IO that behave identically on
``file://``, ``hdfs://`` and ``s3a://`` store paths — ``os``/``shutil``
only cover the first. Everything here is metadata-sized: no data bytes
move through the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class HadoopFs:
    def __init__(self, spark: SparkSession, path: str):
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._hconf = sc._jsc.hadoopConfiguration()
        self.root = self.jpath(path)
        self.fs = self.root.getFileSystem(self._hconf)
        self.root_uri = self.fs.makeQualified(self.root).toString().rstrip("/")

    def jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return self.fs.exists(self.jpath(p))

    def rename(self, src: str, dst: str) -> bool:
        return self.fs.rename(self.jpath(src), self.jpath(dst))

    def delete(self, p: str, recursive: bool = False) -> bool:
        return self.fs.delete(self.jpath(p), recursive)

    def mkdirs(self, p: str) -> bool:
        return self.fs.mkdirs(self.jpath(p))

    def list_parquet(self, base: str) -> list[tuple[str, int]]:
        """Recursive (relative_path, size) listing of *.parquet files."""
        return [(rel, size) for rel, size, _ in self.list_parquet_status(base)]

    def list_parquet_status(self, base: str) -> list[tuple[str, int, int]]:
        """Recursive (relative_path, size, mtime_ms) listing of
        *.parquet files — mtime feeds grace-period vacuum decisions."""
        base_q = self.fs.makeQualified(self.jpath(base)).toString().rstrip("/")
        out: list[tuple[str, int, int]] = []
        if not self.fs.exists(self.jpath(base)):
            return out
        it = self.fs.listFiles(self.jpath(base), True)
        while it.hasNext():
            status = it.next()
            full = status.getPath().toString()
            if full.endswith(".parquet"):
                out.append(
                    (
                        full[len(base_q) + 1 :],
                        status.getLen(),
                        status.getModificationTime(),
                    )
                )
        return sorted(out)

    def list_names(self, dir_path: str) -> list[str]:
        """Non-recursive child names of a directory ([] if absent)."""
        jp = self.jpath(dir_path)
        if not self.fs.exists(jp):
            return []
        return sorted(
            status.getPath().getName() for status in self.fs.listStatus(jp)
        )

    def write_text(self, p: str, text: str) -> None:
        stream = self.fs.create(self.jpath(p), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def read_text(self, p: str) -> str:
        # py4j passes byte[] buffers by value (no read-back), so stream
        # the bytes JVM-side; commons-io ships with Spark.
        stream = self.fs.open(self.jpath(p))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
