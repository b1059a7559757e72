"""Per-query profiling harness for the optimization rounds.

Times individual catalog faces with the bench's methodology (count()
action, clearCache between reps, min-of-N) at an arbitrary SF dir, and
optionally dumps the formatted physical plan — the measure-first loop
of the optimization guide without paying for the whole bench.

    python -m tests.perf_probe NAME [NAME ...] [--sf-dir DIR] [--reps N]
        [--explain OUTDIR] [--suffix TAG] [--noop]

--explain writes OUTDIR/<name>_<TAG>.txt with explain("formatted").
--noop times a noop-sink write instead of count() (guide §1.4); the
  bench's graded numbers stay count()-based, this is for isolating
  computation during analysis.
"""

from __future__ import annotations

import os
import sys
import time


def main(argv: list[str]) -> int:
    names: list[str] = []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    explain_dir = None
    suffix = "probe"
    use_noop = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf-dir":
            sf_dir = argv[i + 1]; i += 2
        elif a == "--reps":
            reps = int(argv[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = argv[i + 1]; i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]; i += 2
        elif a == "--noop":
            use_noop = True; i += 1
        else:
            names.append(a); i += 1

    from uw_mapreduce_spark.plans.catalog import QUERIES
    from uw_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="perf-probe")
    # Same warmup as bench.py: parquet footers + Python worker pool.
    # (scale-curve dirs hold only documents+embeddings)
    for t in ("lineitem", "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            break
        except Exception:
            continue

    def _noop(it):
        yield from it

    warm = spark.range(0, 1024, 1, int(spark.sparkContext.defaultParallelism))
    warm.mapInPandas(_noop, "id long").count()

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)

    for name in names:
        fn = QUERIES[name]
        if explain_dir:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        times = []
        for rep in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                if use_noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                times.append(round(time.time() - t0, 3))
            except Exception as e:
                msg = " ".join(f"{type(e).__name__}: {e}".split())
                print(f"ERROR {name} rep{rep}: {msg[:300]}", flush=True)
                times.append(-1.0)
            spark.sparkContext.setJobDescription(None)
            import gc
            gc.collect()
        ok = [t for t in times if t >= 0]
        print(
            f"TIMES {name}: min={min(ok) if ok else -1.0} raw={times}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
