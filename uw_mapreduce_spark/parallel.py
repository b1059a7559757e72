"""Driver-side job overlap (optimization guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially.  Faces that orchestrate INDEPENDENT eager branches — the
curation pipelines run a lexical connected-components loop and a
semantic one, each a chain of small blocking jobs — waste the tail of
every round waiting on one branch while executors sit idle.  Submitting
the branches from a small thread pool lets the next branch's tasks
back-fill freed cores; results are unchanged (each branch is
deterministic and touches disjoint frames).

Spark's job description / scheduler properties are JVM-thread-local,
and under PySpark's default pinned-thread mode a plain pool thread maps
to a FRESH JVM thread that inherits nothing (ADVICE r10) — so each
thunk wrapper clones the caller's local properties into its own thread
before running (the documented ``pyspark.InheritableThread`` technique,
applied per task instead of per thread).  Branch jobs therefore keep
the caller's job group/description: harness-level ``setJobDescription``
labels and ``cancelJobGroup`` cover them.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, TypeVar

T = TypeVar("T")


def _caller_local_properties():
    """Clone of the calling thread's JVM-side local properties, or None
    when no SparkContext is live (pure-Python thunks in tests)."""
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is None:
            return None, None
        return sc, sc._jsc.sc().getLocalProperties().clone()
    except Exception:
        return None, None


def run_concurrently(*thunks: Callable[[], T]) -> list[T]:
    """Run the thunks on driver threads, return their results in call
    order.  The first exception (if any) propagates after all threads
    finish — no branch is left half-running."""
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    sc, props = _caller_local_properties()

    def _wrap(t: Callable[[], T]) -> Callable[[], T]:
        def run() -> T:
            if sc is not None and props is not None:
                try:
                    sc._jsc.sc().setLocalProperties(props.clone())
                except Exception:
                    pass
            return t()

        return run

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(_wrap(t)) for t in thunks]
        # collect all outcomes first so a failing branch never leaves a
        # sibling's jobs racing a torn-down caller scope
        outcomes = [None] * len(futures)
        first_err: BaseException | None = None
        for i, f in enumerate(futures):
            try:
                outcomes[i] = f.result()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err
        return list(outcomes)
