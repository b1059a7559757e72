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

Job descriptions and scheduler properties are thread-local in Spark, so
concurrent branches stay correctly labeled in the UI.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, TypeVar

T = TypeVar("T")


def run_concurrently(*thunks: Callable[[], T]) -> list[T]:
    """Run the thunks on driver threads, return their results in call
    order.  The first exception (if any) propagates after all threads
    finish — no branch is left half-running."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
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
