"""Stateful streaming page-resume ledger (applyInPandasWithState).

The streaming form of ``operators/monitor.page_resume_ledger``: page
completion events arrive out of order (the reference's thread pool at
`semantic search - ey prep/stage_00_pdf_to_markdown.py:429` completes
pages concurrently but the write cursor advances strictly in page
order), and per-document state tracks the outcomes seen so far.  When
the LAST outstanding page of a document reports, the document's ledger
row — longest completed prefix, first failed page, completed-but-lost
pages after the write-cursor gap, resume point — is emitted and the
state cleared; documents still mid-flight at drain time are the
standard completeness lag (every planted source document completes, so
the parity test compares the full set).

State is O(pages-per-document): the page outcome set must be held until
the document finishes because the first-failure page number — the write
cursor's stopping point — can move EARLIER as stragglers arrive, which
re-classifies later ok pages between written and lost.  Python is
justified as in the EWMA/CUSUM twins: a cross-batch per-group state
transition with data-dependent classification Catalyst cannot express.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.monitor import PRL_PAGE_CHARS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("total_pages", T.LongType()),
        T.StructField("done_prefix", T.LongType()),
        T.StructField("first_failed_page", T.LongType()),
        T.StructField("lost_after_gap", T.LongType()),
        T.StructField("resume_from", T.LongType()),
        T.StructField("is_complete", T.IntegerType()),
        T.StructField("remaining_bp", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("np", T.IntegerType()),
        T.StructField("n_seen", T.IntegerType()),
        T.StructField("min_fail", T.IntegerType()),  # 0 = none yet
        T.StructField("ok_pages", T.ArrayType(T.IntegerType())),
    ]
)


def _ledger_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (doc_id,) = key
    events = pd.concat(list(pdfs))

    if state.exists:
        np_, n_seen, min_fail, ok_pages = state.get
        ok_pages = list(ok_pages)
    else:
        np_, n_seen, min_fail, ok_pages = 0, 0, 0, []

    for page, ok, np_col in zip(
        events["page"].to_numpy(), events["ok"].to_numpy(), events["np"].to_numpy()
    ):
        np_ = int(np_col)
        n_seen += 1
        if bool(ok):
            ok_pages.append(int(page))
        elif min_fail == 0 or int(page) < min_fail:
            min_fail = int(page)

    if n_seen < np_ or np_ == 0:
        state.update((int(np_), int(n_seen), int(min_fail), [int(p) for p in ok_pages]))
        return

    # every page reported: the ledger row is final (batch-identical)
    done_prefix = (min_fail - 1) if min_fail else np_
    lost = sum(1 for p in ok_pages if p > done_prefix)
    state.remove()
    yield pd.DataFrame(
        {
            "doc_id": [int(doc_id)],
            "total_pages": [np_],
            "done_prefix": [done_prefix],
            "first_failed_page": [min_fail if min_fail else None],
            "lost_after_gap": [lost],
            "resume_from": [done_prefix + 1 if done_prefix < np_ else None],
            "is_complete": [1 if done_prefix == np_ else 0],
            "remaining_bp": [(np_ - done_prefix) * 10000 // np_],
        }
    )


def page_events(spark: SparkSession, sf_dir: str, *, streaming: bool) -> DataFrame:
    """The planted page-completion event table — one row per (doc,
    page) with the SAME md5 outcome device the batch operator derives,
    page count carried on every event so the stream knows when a
    document has fully reported."""
    if streaming:
        schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        docs = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "documents.parquet")
            .load(sf_dir)
            .select("doc_id", "text")
        )
    else:
        from ..sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    np_col = (F.expr(f"length(text) div {PRL_PAGE_CHARS}") + 1).cast("int")
    return (
        docs.select("doc_id", np_col.alias("np"))
        .select("doc_id", "np", F.explode(F.expr("sequence(1, np)")).alias("page"))
        .select(
            "doc_id",
            "np",
            F.col("page").cast("int").alias("page"),
            F.expr(
                "cast(conv(substring(md5(concat(cast(doc_id as string), ':pg:',"
                " cast(page as string))), 1, 8), 16, 10) as bigint) % 10 < 8"
            ).alias("ok"),
        )
    )


def streaming_resume_ledger(pages: DataFrame) -> DataFrame:
    """pages: streaming (doc_id, np, page, ok). Emits one final ledger
    row per document once all its pages have reported."""
    return pages.groupBy("doc_id").applyInPandasWithState(
        _ledger_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
