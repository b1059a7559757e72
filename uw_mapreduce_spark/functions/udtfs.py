"""Python UDTFs (user-defined TABLE functions, Spark 3.5+/4.x API):
one input row → many output rows, usable from SQL via LATERAL.

Where UDTFs sit in this engine's UDF doctrine: built-in expressions
first, Arrow-vectorized pandas_udf/mapInPandas where Python is
unavoidable, and UDTFs ONLY for one-to-many row generation whose logic
genuinely needs Python (a real sentence splitter would call a model or
a rules library; the regex version here keeps the demo oracle-exact).
Python UDTFs execute row-at-a-time — at scale prefer explode(built-in
array expr) when the split IS expressible, exactly as
`token_histogram_documents` does; this module exists so the SQL
surface still has the LATERAL table-function shape when it is not.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_SPLIT = re.compile(r"[.!?]")
_STRIP = " \t\r\n"


@udtf(returnType="idx: bigint, sentence: string")
class Sentences:
    """(text) → one row per non-empty sentence, 0-indexed in order.
    The strip charset is explicit so the DuckDB oracle (`trim(x, ' ' ||
    chr(9) || chr(13) || chr(10))`) matches byte-for-byte."""

    def eval(self, text):  # noqa: D102 — UDTF contract method
        i = 0
        for part in _SENTENCE_SPLIT.split(text or ""):
            part = part.strip(_STRIP)
            if part:
                yield i, part
                i += 1


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs for SQL use."""
    spark.udtf.register("sentences_udtf", Sentences)
