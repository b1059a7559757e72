"""Minimal versioned tables: append-only snapshot directories with a
manifest, giving a training pipeline the two properties it actually
needs from data versioning — REPRODUCIBILITY (a run pins the exact
corpus version it trained on and can re-read it forever) and SAFE
PUBLISH (a new version becomes visible only when its manifest lands,
so readers never see a half-written snapshot).

Layout:

    table/
      v=1/ ... parquet files ...
      v=2/ ...
      _versions/1.json   {"version": 1, "n_files": ..., "schema": ...}
      _versions/2.json

The manifest write is the commit point: ``write_version`` stages the
parquet directory FIRST and writes the (single, small) manifest file
last, so a crash mid-write leaves an orphaned data directory but never
a readable-but-incomplete version.  This is the poor man's slice of a
transactional table format (Delta/Iceberg): linear versions only — no
concurrent writers, no row-level deletes, no schema evolution — which
is exactly the corpus-snapshot use case.  ``vacuum_versions`` retires
old snapshots while always keeping the latest N.

At 100 TB each version is a full directory, so this suits PUBLISH
points (monthly corpus cuts), not per-batch churn — incremental churn
belongs to the changelog/IVM machinery (`operators/merge.py`).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_versions")


def list_versions(path: str) -> list[int]:
    """Committed versions, ascending (a version exists iff its manifest
    does — orphaned data dirs from crashed writes are invisible)."""
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".json"):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                continue
    return sorted(out)


def write_version(df: DataFrame, path: str) -> int:
    """Publish ``df`` as the next version of the table; returns the new
    version number.  Data first, manifest last (the commit point)."""
    versions = list_versions(path)
    v = (versions[-1] if versions else 0) + 1
    data_dir = os.path.join(path, f"v={v}")
    df.write.mode("overwrite").parquet(data_dir)
    n_files = sum(
        1
        for root, _dirs, files in os.walk(data_dir)
        for f in files
        if not f.startswith(("_", "."))
    )
    os.makedirs(_manifest_dir(path), exist_ok=True)
    manifest = {
        "version": v,
        "n_files": n_files,
        "schema": df.schema.jsonValue(),
    }
    tmp = os.path.join(_manifest_dir(path), f".{v}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(_manifest_dir(path), f"{v}.json"))  # atomic commit
    return v


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (or the latest committed one).  Raises if
    the requested version was never committed or has been vacuumed."""
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} under {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def vacuum_versions(path: str, keep_last: int = 2) -> list[int]:
    """Retire all but the newest ``keep_last`` versions (manifest
    removed FIRST so readers lose visibility before bytes disappear).
    Returns the removed version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(path)
    drop = versions[:-keep_last]
    for v in drop:
        os.remove(os.path.join(_manifest_dir(path), f"{v}.json"))
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    return drop
