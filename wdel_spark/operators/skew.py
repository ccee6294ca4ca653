"""Skew-aware equi-join: hot-key detection + salting.

The blocking join (S2) is the pipeline's O(N·M)-shaped hazard: a promiscuous
alias key ("罗马"-like; the corpus fixture makes one alias own ~30% of
mentions) turns one shuffle partition into the straggler.  Mitigations, in
order:

1. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``) — on by default
   in our session factory; splits oversized sort-merge partitions at
   runtime.
2. Broadcast: if the build side (KB aliases) fits, there is no shuffle at
   all — preferred whenever aliases ≤ a few GB per executor.
3. Explicit salting (this module) for the sort-merge path at full scale:
   detect keys above a count threshold with one aggregate, explode the
   *build* side ×S for those keys, salt the *probe* side deterministically
   (hash of its row key, not rand() — resumability requires determinism).

``salted_join`` is semantics-preserving: output equals ``probe.join(build,
on=key)`` exactly, for any S ≥ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` — one aggregate pass."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("_cnt"))
        .where(F.col("_cnt") > threshold)
        .select(key)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_mod: int = 16,
    hot_threshold: int = 100_000,
    probe_salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build ON key`` with hot keys salted ×``salt_mod``.

    ``probe_salt_cols``: columns whose hash spreads hot probe rows across
    salts (default: all probe columns).  Deterministic — same input rows →
    same salt → resumable.
    """
    hot = hot_keys(probe, key, hot_threshold).withColumn("_hot", F.lit(True))

    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_mod - 1))
    ).alias("_salt")
    build_salted = (
        build.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt_arr",
            F.when(F.col("_hot").isNotNull(),
                   F.sequence(F.lit(0), F.lit(salt_mod - 1)))
            .otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salt_arr"))
        .drop("_salt_arr", "_hot")
    )
    salt_src = probe_salt_cols or probe.columns
    probe_salted = (
        probe.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*salt_src), F.lit(salt_mod)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    return (
        probe_salted.join(build_salted, on=[key, "_salt"], how=how)
        .drop("_salt")
    )
