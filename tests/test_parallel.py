"""run_concurrently edge cases (ADVICE r10)."""

from __future__ import annotations

import pytest

from uw_mapreduce_spark.parallel import run_concurrently


def test_zero_thunks_returns_empty_list():
    # ThreadPoolExecutor(max_workers=0) would raise ValueError; the
    # empty call must short-circuit instead.
    assert run_concurrently() == []


def test_results_in_call_order():
    assert run_concurrently(lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_first_exception_propagates_after_all_finish():
    done = []

    def ok():
        done.append(1)
        return "ok"

    def boom():
        raise RuntimeError("branch failed")

    with pytest.raises(RuntimeError, match="branch failed"):
        run_concurrently(ok, boom)
    assert done == [1]  # the sibling ran to completion first
