"""`kvtext` — the reference's tab-separated KV format as a Spark 4
PYTHON DATA SOURCE (`pyspark.sql.datasource`), the engine's custom
connector surface.

Where `sources/text_kv.read_text_kv` parses via the built-in text scan
(the production path — splittable, whole-stage codegen), this module
demonstrates the CONNECTOR contract a format without a built-in reader
would need: a `DataSource` subclass registered under a short name,
driver-side partition PLANNING (one `InputPartition` per file — the
unit of parallelism), and an executor-side `read(partition)` generator
that yields tuples matching the declared schema.  Usage:

    spark.dataSource.register(KVTextDataSource)
    df = spark.read.format("kvtext").option("path", p).load()

Scale notes, explicit because this is the template for real external
connectors: partition planning lists FILES ONLY (never opens them) so
the driver cost is O(files); each file reads on one executor core —
for 100 TB you'd split large files at byte ranges and scan forward to
the next newline (what Hadoop's TextInputFormat does); parsing is
int64 (the reference's int32 deliberately widened, SURVEY §2.3.5), and
malformed lines yield NULLs rather than poisoning the task, matching
the PERMISSIVE discipline of `sources/ingest.read_csv_quarantine`.

Reference parity: KeyValueTextInputFormat split-on-first-tab
(`SlidingAggregation.java:446`), Integer.parseInt of both fields
(`SlidingAggregation.java:49,137-139`).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

KV_DDL = "key bigint, value bigint"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_kv_files(path: str) -> list[str]:
    """Driver-side planning: expand a file or directory to the sorted
    file list (deterministic partition order).  Hidden/_SUCCESS-style
    bookkeeping files are skipped, matching Hadoop input conventions."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            out.append(os.path.join(root, f))
    return sorted(out)


class KVTextReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires .option('path', ...) or load(path)")
        self._path = path

    def partitions(self):
        files = _list_kv_files(self._path)
        if not files:
            raise FileNotFoundError(f"kvtext: no input files under {self._path!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        def parse(field: str):
            try:
                return int(field)
            except ValueError:
                return None

        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, sep, value = line.partition("\t")
                yield (parse(key), parse(value) if sep else None)


class KVTextDataSource(DataSource):
    """Register with ``spark.dataSource.register(KVTextDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return KV_DDL

    def reader(self, schema) -> KVTextReader:
        return KVTextReader(self.options)

    def writer(self, schema, overwrite: bool) -> "KVTextWriter":
        return KVTextWriter(self.options, overwrite)


class _KVCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class KVTextWriter(DataSourceWriter):
    """The WRITE half of the connector contract: each task streams its
    partition to a uniquely-named temp file (task attempts can't
    collide), returns a commit message, and the DRIVER finalizes by
    renaming the temp files to ``part-r-NNNNN`` in commit order — the
    two-phase output-committer discipline (no partial output becomes
    visible on task failure; abort() removes leftovers).  Output is
    the reference's ``key\tvalue`` text layout
    (`SlidingAggregation.java:451` TextOutputFormat +
    `PairInt.java:80-83` tab join), so the golden harness can diff it."""

    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires .option('path', ...) or save(path)")
        self._path = path
        self._overwrite = overwrite

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f"_tmp-{pid:05d}-{uuid.uuid4().hex}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                k = "" if row[0] is None else str(row[0])
                v = "" if row[1] is None else str(row[1])
                fh.write(f"{k}\t{v}\n")
                n += 1
        return _KVCommit(tmp, n)

    def commit(self, messages):
        # a zero-task write (empty input) reaches commit() without any
        # write() having created the directory
        os.makedirs(self._path, exist_ok=True)
        existing = [f for f in os.listdir(self._path) if f.startswith("part-r-")]
        if self._overwrite:
            # clear stale parts so an overwrite of a wider previous
            # write can't leave orphan part files behind the _SUCCESS
            for f in existing:
                os.remove(os.path.join(self._path, f))
            start = 0
        else:
            # append mode: continue numbering after the existing parts —
            # renaming onto part-r-00000 would silently clobber them
            start = 1 + max(
                (int(f.split("-")[-1]) for f in existing), default=-1
            )
        for i, m in enumerate(sorted(messages, key=lambda m: m.tmp_path)):
            os.replace(
                m.tmp_path, os.path.join(self._path, f"part-r-{start + i:05d}")
            )
        with open(os.path.join(self._path, "_SUCCESS"), "w", encoding="utf-8"):
            pass

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
