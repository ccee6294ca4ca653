"""Flagship entry: the ER pipeline over /root/testdata documents.

The driver's flat ``documents(doc_id, text, lang, source, n_chars)`` table
lacks the interleaved ``spans`` column of the pipeline's input hint, so we
*derive* it deterministically (engine-portable md5 partitioning of token
positions into text/mention/media kinds — reproducible in DuckDB SQL for
the oracle check), then run the full blocking → scoring → clustering
pipeline self-supervised: the KB is the corpus's own token vocabulary.
This is the ER-as-deduplication framing: repeated tokens across documents
resolve to the same vocabulary entity, naturally skewed (stopwords are hot
keys) — the same shuffle/skew profile as the synthetic corpus at scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

from wdel_spark.functions.textnorm import normalize_text, block_key
from wdel_spark.functions.scoring import hash_embed, EMBED_DIM
from wdel_spark.plans.pipeline import (
    PipelineParams,
    extract_mentions,
    block_candidates,
    score_pairs,
    cluster_mentions,
)


def derive_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat documents -> interleaved (doc_id, spans[]) table.

    Span kind from the first hex char of md5("<doc_id>:<pos>"):
    0-2 -> mention (3/16), 3 -> media (1/16), else text — identical
    semantics expressible in DuckDB for the oracle-checked span stats.
    Offsets are cumulative char positions (token lengths + single spaces).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split("text", " +")).alias("pos", "tok"),
    )
    h = F.substring(
        F.md5(F.concat_ws(":", "doc_id", F.col("pos").cast("string"))), 1, 1
    )
    kind = (
        F.when(h.isin("0", "1", "2"), F.lit("mention"))
        .when(h == "3", F.lit("media"))
        .otherwise(F.lit("text"))
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    spans = toks.select(
        "doc_id",
        "pos",
        kind.alias("kind"),
        F.when(kind == "media", F.lit("")).otherwise(F.col("tok")).alias("text"),
        F.when(
            kind == "media",
            F.concat_ws("/", F.lit("img:/"), "doc_id",
                        F.col("pos").cast("string")),
        ).otherwise(F.lit("")).alias("media_ref"),
        F.coalesce(
            F.sum(F.length("tok") + 1).over(w), F.lit(0)
        ).cast("int").alias("offset"),
    )
    return spans.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", "kind", "text", "media_ref", "offset")
                )
            ),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans")
    )


_KB_SCHEMA = (
    "qid string, alias string, norm_alias string, block_key string, "
    "lang string, is_label boolean"
)


def derive_vocab_kb(spark: SparkSession, docs_spans: DataFrame
                    ) -> tuple[DataFrame, DataFrame]:
    """KB = the corpus's own mention vocabulary.

    One entity per distinct normalized mention text; qid = md5-derived.
    Featurization through the same kernels as the real KB (mapInPandas,
    no per-row Python).  Returns (kb_aliases, entity_vectors)."""
    vocab = (
        docs_spans.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "mention")
        .select(F.col("s.text").alias("alias"))
        .distinct()
    )

    def feat(batches):
        for pdf in batches:
            norms = [normalize_text(t) for t in pdf["alias"]]
            yield pd.DataFrame({
                "qid": ["T" + __import__("hashlib").md5(n.encode()).hexdigest()[:12]
                        for n in norms],
                "alias": pdf["alias"],
                "norm_alias": norms,
                "block_key": [block_key(n) for n in norms],
                "lang": ["en"] * len(pdf),
                "is_label": [True] * len(pdf),
            })

    kb_aliases = vocab.mapInPandas(feat, schema=_KB_SCHEMA).dropDuplicates(
        ["qid", "norm_alias"])

    def vec(batches):
        for pdf in batches:
            sub = pdf.drop_duplicates(subset=["qid"])
            vs = hash_embed(sub["norm_alias"].tolist(), EMBED_DIM)
            yield pd.DataFrame({
                "qid": sub["qid"],
                "vec": [v.tolist() for v in vs],
            })

    entity_vectors = (
        kb_aliases.select("qid", "norm_alias")
        .dropDuplicates(["qid"])
        .mapInPandas(vec, schema="qid string, vec array<float>")
    )
    return kb_aliases, entity_vectors


def er_over_testdata(
    spark: SparkSession,
    sf_dir: str,
    params: PipelineParams = PipelineParams(),
) -> DataFrame:
    """Full ER pipeline over the derived corpus; returns the cluster table
    (doc_id, span_idx, cluster_id, n_members ordered columns stable)."""
    docs = derive_spans_documents(spark, sf_dir)
    kb_aliases, entity_vectors = derive_vocab_kb(spark, docs)
    kb = kb_aliases.join(
        entity_vectors.withColumnRenamed("vec", "e_vec"), "qid")
    mentions = extract_mentions(docs)
    cands = block_candidates(mentions, kb, params)
    scored = score_pairs(cands)
    per_pair = scored.groupBy("doc_id", "span_idx", "qid").agg(
        F.max("score").alias("score"))
    from wdel_spark.operators.topk import top_k_per_group

    ranked = top_k_per_group(
        per_pair, ["doc_id", "span_idx"],
        [F.desc("score"), F.asc("qid")], params.top_k)
    edges = ranked.where(
        (F.col("rank") == 1) & (F.col("score") >= params.score_threshold)
    ).select(
        F.xxhash64(F.lit("m"), "doc_id", "span_idx").alias("src"),
        F.xxhash64(F.lit("e"), "qid").alias("dst"),
    )
    clusters = cluster_mentions(mentions, edges, params)
    return clusters


def entry_flagship(spark: SparkSession) -> DataFrame:
    return er_over_testdata(spark, "/root/testdata/sf0.001")
