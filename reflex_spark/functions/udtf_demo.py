"""Python UDTF surface (Spark 3.5+): a table function emitting one row per
word shingle. The JVM expression form (operators/dedup.py::word_shingles)
is the production path — this demonstrates the UDTF lane of the UDF/UDAF/
UDTF surface (SURVEY.md §2.2) for logic that genuinely needs imperative
row expansion.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="shingle: string, pos: int")
class ShingleUDTF:
    """eval(text, n) → one row per word n-gram."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        words = text.split(" ")
        for i in range(max(0, len(words) - n + 1)):
            yield (" ".join(words[i : i + n]), i)
