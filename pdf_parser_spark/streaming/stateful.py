"""Custom stateful streaming operator: per-conversation extraction progress.

The reference has no streaming at all (SURVEY.md §2.11); the batch mandate
is served by lineage resume. This is the idiomatic Spark shape for the one
genuinely stateful need an append-only transcripts feed creates: turns of a
conversation arrive across micro-batches, and a consumer wants the
LIVE cumulative per-conversation rollup (turns seen, failures, extracted
chars, max turn index) without re-scanning history.

Implemented with ``applyInPandasWithState`` — the custom-stateful-operator
API: state is a per-key tuple in the state store (checkpointed, so an
AvailableNow restart resumes exactly where it stopped), each micro-batch
folds its group's rows into the state and emits the updated rollup row.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["PROGRESS_SCHEMA", "conversation_progress"]

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_fail", T.LongType(), False),
        T.StructField("chars_extracted", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_fail", T.LongType(), False),
        T.StructField("chars_extracted", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, f, c, m = state.get
    else:
        n, f, c, m = 0, 0, 0, -1
    for pdf in pdfs:
        n += len(pdf)
        f += int((~pdf["extraction_ok"].astype(bool)).sum())
        c += int(pdf["extracted_text"].str.len().fillna(0).sum())
        m = max(m, int(pdf["turn_idx"].max()))
    state.update((n, f, c, m))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "n_turns": n,
                "n_fail": f,
                "chars_extracted": c,
                "max_turn_idx": m,
            }
        ]
    )


def conversation_progress(extracted: DataFrame) -> DataFrame:
    """extracted streaming DataFrame (pipeline.RESULT_SCHEMA columns) →
    streaming rollup emitting one updated row per conversation per
    micro-batch that touched it. State lives in the state store keyed by
    conv_id — at cluster scale the store is partitioned with the stream,
    so a hot conversation costs one key, not a shuffle of history."""
    from .. import ship_package

    ship_package(extracted.sparkSession)
    return extracted.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
