"""KB hydrate: relational Entity/P31/P279 tables -> nested entity records.

Restates the reference's per-request hydrate (`/root/reference/src/
pipeline.py:160-251`: Entity LEFT JOIN P31 LEFT JOIN P279 -> per-qid dict
with first-wins scalars, appended relation paths, JSON-decoded cells) and
the KB-merge path cap (`merge_info.py:110-111,141-142`) as one distributed
Spark plan producing `sources/kb_io.ENTITY_SCHEMA` structs.

Deliberate deviations from the reference, documented:

- **No p31 x p279 duplication.** The reference's single 3-way LEFT JOIN
  cross-products the two relation tables per entity and appends p31 paths
  once per p279 row (and vice versa) — a latent fanout bug of
  `pipeline.py:160-251`.  We aggregate each relation independently.
- **Path cap = 11, not 10.** `merge_info.py:110` skips only when the list
  is already `> 10` long, so an 11th path is appended before the cap
  binds; we mirror the actual behavior.
- **Deterministic path order.** The reference caps in file-read order; we
  require an explicit ``ord`` column (ingest line number, or any stable
  key) so reruns and engines agree.

JSON cell codec (SURVEY §2 F9): the reference stores alt/p31/p279 cells
as JSON strings in MySQL (`mysql_build.py:122-150`) and json.loads them at
query time (`pipeline.py:228-250`).  ``encode_entity_cells`` /
``hydrate_entities`` are the Spark-native `to_json`/`from_json` halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MAX_PATHS = 11  # merge_info.py:110 appends at len==10 -> effective cap 11

_ARR = "array<string>"


def encode_entity_cells(nested: DataFrame) -> DataFrame:
    """Nested ENTITY_SCHEMA -> flat MySQL-shaped rows with JSON cells.

    Output: (qid, label_en, label_zh, desc_en, desc_zh, alt_en, alt_zh)
    where the alt columns are JSON-encoded arrays, exactly as
    `mysql_build.py:122-133` inserts them."""
    return nested.select(
        "qid",
        F.col("label.en").alias("label_en"),
        F.col("label.zh").alias("label_zh"),
        F.col("desc.en").alias("desc_en"),
        F.col("desc.zh").alias("desc_zh"),
        F.to_json("alt.en").alias("alt_en"),
        F.to_json("alt.zh").alias("alt_zh"),
    )


def encode_relation_cells(nested: DataFrame, rel: str) -> DataFrame:
    """Nested ENTITY_SCHEMA -> one row per relation path with JSON cells.

    Output: (qid, ord, {rel}_qid, {rel}_en, {rel}_zh); each cell is one
    JSON-encoded path (`mysql_build.py:136-150` inserts one row per path).
    ``ord`` is the path's array position — the deterministic stand-in for
    the reference's file-read order."""
    p = nested.select(
        "qid", F.posexplode(F.col(f"{rel}.qid")).alias("ord", "path_qid"))
    en = nested.select(
        "qid", F.posexplode(F.col(f"{rel}.en")).alias("ord", "path_en"))
    zh = nested.select(
        "qid", F.posexplode(F.col(f"{rel}.zh")).alias("ord", "path_zh"))
    return (
        p.join(en, ["qid", "ord"], "left")
        .join(zh, ["qid", "ord"], "left")
        .select(
            "qid", "ord",
            F.to_json("path_qid").alias(f"{rel}_qid"),
            F.to_json("path_en").alias(f"{rel}_en"),
            F.to_json("path_zh").alias(f"{rel}_zh"),
        )
    )


def _nest_relation(flat: DataFrame, rel: str, max_paths: int) -> DataFrame:
    """(qid, ord, {rel}_qid/{rel}_en/{rel}_zh JSON cells) -> (qid, struct
    of path arrays) with the ≤``max_paths`` cap in ``ord`` order."""
    decoded = flat.select(
        "qid", "ord",
        F.from_json(f"{rel}_qid", _ARR).alias("pq"),
        F.from_json(f"{rel}_en", _ARR).alias("pe"),
        F.from_json(f"{rel}_zh", _ARR).alias("pz"),
    )
    # Cap BEFORE collecting (r6, guide §2.3 "aggregate before you
    # shuffle"): the former slice(array_sort(collect_list(...)), 1, cap)
    # shipped and materialized EVERY path of every qid (a hot qid's whole
    # path set in one array) only to keep the first ``max_paths``.  The
    # row_number window orders by the SAME full struct key as array_sort
    # (ord, pq, pe, pz — lexicographic, so ord ties break identically),
    # and Spark's WindowGroupLimit prunes each map partition to its local
    # top-``max_paths`` before the exchange; the surviving <= max_paths
    # rows per qid then collect and sort exactly as before.
    w = Window.partitionBy("qid").orderBy("ord", "pq", "pe", "pz")
    capped = (
        decoded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_paths)
        .groupBy("qid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ord", "pq", "pe", "pz"))
            ).alias("paths")
        )
    )
    return capped.select(
        "qid",
        F.struct(
            F.transform("paths", lambda s: s["pq"]).alias("qid"),
            F.transform("paths", lambda s: s["pe"]).alias("en"),
            F.transform("paths", lambda s: s["pz"]).alias("zh"),
        ).alias(rel),
    )


def _empty_rel() -> F.Column:
    return F.struct(
        F.array().cast("array<array<string>>").alias("qid"),
        F.array().cast("array<array<string>>").alias("en"),
        F.array().cast("array<array<string>>").alias("zh"),
    )


def hydrate_entities(
    entity: DataFrame,
    p31: DataFrame | None = None,
    p279: DataFrame | None = None,
    max_paths: int = MAX_PATHS,
) -> DataFrame:
    """Relational tables -> nested ENTITY_SCHEMA records (J1+A1+A6).

    ``entity``: one row per qid (the reference's Entity table has qid as
    primary key — enforce upstream with ``upsert_snapshot`` if ingesting
    eventually-consistent feeds), columns (qid, label_en, label_zh,
    desc_en, desc_zh, alt_en, alt_zh) with JSON-encoded alt cells.
    ``p31``/``p279``: output shape of ``encode_relation_cells``.

    The relation aggregates shuffle on qid once each and join back on qid;
    missing relations hydrate to empty path arrays (reference initializes
    `{"qid": [], ...}` — pipeline.py:196-201).

    Empty-string cells are ABSENT: the reference fills fields through
    truthiness checks (`if label_en:` / `if alt_en:`, pipeline.py:213-230),
    so a ``""`` MySQL cell never hydrates — ``nullif`` mirrors that here
    (ADVICE r2: a ``""`` label previously hydrated to ``""`` and leaked
    ``name: ;`` segments into the entity text serialization)."""
    absent = lambda c: F.nullif(F.col(c), F.lit(""))
    out = entity.select(
        "qid",
        F.struct(absent("label_en").alias("en"),
                 absent("label_zh").alias("zh")).alias("label"),
        F.struct(absent("desc_en").alias("en"),
                 absent("desc_zh").alias("zh")).alias("desc"),
        # reference initializes alt to [] and fills only non-null cells
        # (pipeline.py:198,225-229) -> null/"" cell hydrates to empty array
        F.struct(
            F.coalesce(F.from_json(absent("alt_en"), _ARR),
                       F.array().cast(_ARR)).alias("en"),
            F.coalesce(F.from_json(absent("alt_zh"), _ARR),
                       F.array().cast(_ARR)).alias("zh"),
        ).alias("alt"),
    )
    for rel, flat in (("p31", p31), ("p279", p279)):
        if flat is None:
            out = out.withColumn(rel, _empty_rel())
        else:
            nested_rel = _nest_relation(flat, rel, max_paths)
            out = out.join(nested_rel, "qid", "left").withColumn(
                rel, F.coalesce(F.col(rel), _empty_rel()))
    return out.select("qid", "label", "desc", "alt", "p31", "p279")
