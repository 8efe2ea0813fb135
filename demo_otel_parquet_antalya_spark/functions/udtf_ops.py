"""Python UDTF surface (SURVEY.md §2.C UDF/UDTF row): table-valued functions
for 1-row -> N-rows expansion where the output shape is data-dependent.

UDTFs are the escape hatch when ``explode`` over a column expression can't
express the expansion (stateful per-row logic, irregular yields). They run
in Python workers, so like all Python paths here they are off the relational
hot path and defined inside a factory so cloudpickle ships the class BY
VALUE — executors never need this package importable (same rule as the
mapInPandas operators).

``sentences`` is the registered demo: sentence segmentation with
per-sentence positions and token counts — the document-chunking primitive of
a training-data pipeline (chunk → score → dedup per chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


def split_sentences_udtf():
    """text -> one row per '.'-terminated sentence (trimmed, empties dropped).
    Fresh class per call, defined in function scope for by-value pickling."""

    @udtf(returnType="pos: int, sentence: string, n_tokens: int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(p.strip() for p in text.split(".")):
                if raw:
                    yield i, raw, len(raw.split())

    return SplitSentences


def sentences(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Lateral-join the UDTF against a documents table:
    (doc_id, pos, sentence, n_tokens), one row per sentence."""
    fn = split_sentences_udtf()
    return documents.lateralJoin(
        fn(F.col(text_col).outer())
    ).select(id_col, "pos", "sentence", "n_tokens")
