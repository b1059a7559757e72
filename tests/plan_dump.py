"""Dump `explain("formatted")` for declared query faces.

Usage:
    python -m tests.plan_dump <out_dir> <suffix> <face> [<face> ...]

Writes <out_dir>/<face>_<suffix>.txt for each face.  Plans only — no
action is executed (iterative kernels still run their tiny per-round
counts/collects while BUILDING the plan; that is inherent to their
shape).  Run from the repo root whose code you want to snapshot (the
round's pristine worktree for `before`, the working tree for `after`).
"""

import os
import sys


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    faces = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from uw_mapreduce_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=32)
    queries = entry.queries()
    for face in faces:
        path = os.path.join(out_dir, f"{face}_{suffix}.txt")
        try:
            df = queries[face](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the dump
            plan = f"PLAN DUMP FAILED: {type(e).__name__}: {e}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
