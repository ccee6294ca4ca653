"""Windowed per-group top-k with deterministic tie-breaking.

Replaces the reference's per-mention ``scores.topk(10)``
(`/root/reference/src/candidate_generation/prediction.py:61`) and its
argmax selection (`/root/reference/src/entity_disambiguation/eval.py:218`,
first index wins on ties → here: stable secondary order keys).

Physical note: ``row_number`` over (partition keys) is a single shuffle on
the group keys and is rank-pruned by Spark's WindowGroupLimit optimization
(top-k pushdown) before the sort — no full materialization of each group.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per group; appends 1-based ``rank_col``.

    ``order_cols`` must produce a total order (include a unique tiebreaker,
    e.g. ``[F.desc("score"), F.asc("qid")]``) for deterministic output."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
