"""Document deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Beyond the reference's ER scope — these are the companion operations a
training-data pipeline needs at 100 TB (task brief).  All are
deterministic; MinHash uses md5-based band hashing so the SAME semantics
are expressible in DuckDB SQL for the oracle check.

Scale notes:
  - exact dedup: one hash-groupBy shuffle on the content hash;
  - MinHash-LSH: narrow per-doc signature computation (JVM expressions,
    no Python), then one shuffle per band on the band-minhash key; pair
    output bounded by bucket sizes (cap promiscuous buckets like hot
    blocking keys — same salting machinery applies);
  - SimHash: Arrow-batched kernel (numpy popcount), bucket by band of
    bits, verify by Hamming distance;
  - embedding near-dup: block by coarse LSH sign-bits, exact cosine
    re-rank within blocks (brute-force only per-block).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# --------------------------------------------------------------- MinHash


def char_shingles(text_col: str | Column, n: int = 5) -> Column:
    """All char n-grams of a string as an array column (JVM-side)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )


def minhash_signature(text_col: str | Column, n_bands: int = 4,
                      shingle_n: int = 5) -> list[Column]:
    """Per-band minhash = lexicographic min of md5(band || shingle).

    md5-as-permutation is a standard trick: each band prefix induces an
    independent pseudo-permutation of the shingle space; the min over a
    document's shingles is the MinHash.  String mins are deterministic and
    portable to any SQL engine."""
    sh = char_shingles(text_col, shingle_n)

    def band_min(b: int) -> Column:
        # NB: a one-arg lambda is required — a second (defaulted) parameter
        # would make pyspark pass the array index into it
        prefix = F.lit(str(b))
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(prefix, s)))
        ).alias(f"mh_{b}")

    return [band_min(b) for b in range(n_bands)]


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    shingle_n: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs: documents sharing ≥1 band minhash.

    Output: (doc_a, doc_b, n_shared_bands) with doc_a < doc_b.
    Buckets larger than ``max_bucket`` are dropped (promiscuous shingles,
    e.g. boilerplate) — the count is the caller's lineage counter."""
    sigs = docs.select(F.col(id_col).alias("doc"),
                       *minhash_signature(text_col, n_bands, shingle_n))
    bands = None
    for b in range(n_bands):
        part = sigs.select(
            "doc", F.lit(b).alias("band"), F.col(f"mh_{b}").alias("mh"))
        bands = part if bands is None else bands.unionByName(part)
    # prune huge buckets before the self-join explodes
    sized = bands.join(
        bands.groupBy("band", "mh").agg(F.count("*").alias("bs")),
        ["band", "mh"],
    ).where(F.col("bs") <= max_bucket).drop("bs")
    a = sized.alias("a")
    b2 = sized.alias("b")
    pairs = (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.mh") == F.col("b.mh"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.col("a.band").alias("band"))
        .distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )
    return pairs


# ---------------------------------------------------------------- Jaccard


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for an explicit pair list.

    (pairs: doc_a, doc_b) -> (doc_a, doc_b, jaccard).  Shingle sets stay
    JVM-side (array_distinct / array_intersect / array_union)."""
    sets = docs.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(char_shingles(text_col, shingle_n)).alias("sh"),
    )
    return (
        pairs.join(sets.withColumnRenamed("doc", "doc_a")
                   .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")), 6
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------- SimHash

SIMHASH_BITS = 64


def simhash_kernel(texts: list[str], n: int = 4) -> np.ndarray:
    """64-bit SimHash over char n-gram md5 hashes (pure kernel, shared with
    tests' oracle).  Returns int64 array (bit 63 kept zero to stay in
    signed-long range)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for row, t in enumerate(texts):
        acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
        for i in range(max(len(t) - n + 1, 1)):
            g = t[i : i + n]
            h = int.from_bytes(
                hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
            for b in range(SIMHASH_BITS):
                acc[b] += 1 if (h >> b) & 1 else -1
        bits = 0
        for b in range(SIMHASH_BITS - 1):  # skip sign bit
            if acc[b] > 0:
                bits |= 1 << b
        out[row] = bits
    return out


def simhash_column(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, simhash:long) via an Arrow-batched kernel."""
    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc": pdf[id_col],
                "simhash": simhash_kernel(pdf[text_col].tolist()),
            })

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc string, simhash long")


def simhash_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit sub-bands (a pair within
    Hamming distance 3 shares ≥1 of 4 bands; wider distances may recall
    less — standard SimHash trade-off), verify exact Hamming distance."""
    sims = simhash_column(docs, id_col, text_col)
    bands = None
    for b in range(4):
        part = sims.select(
            "doc", "simhash", F.lit(b).alias("band"),
            F.shiftrightunsigned("simhash", b * 16)
            .bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a, b2 = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    sign_bits: int = 0,
) -> DataFrame:
    """Pairs of vectors with cosine >= threshold.

    ``sign_bits`` > 0 blocks by the sign pattern of the first k dimensions
    (cheap deterministic LSH — vectors in the same orthant; near-identical
    vectors almost surely share it) so the self-join is per-block instead
    of full cross.  0 = exact brute force (small inputs / verification)."""
    vec_d = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(
        F.transform(vec_d, lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    base = emb.select(
        F.col(id_col).alias("id"), vec_d.alias("v"),
        norm.alias("nrm"))
    if sign_bits > 0:
        key = F.concat_ws(
            "",
            F.transform(
                F.slice(F.col("v"), 1, sign_bits),
                lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
            ),
        )
        base = base.withColumn("blk", key)
        cond = (F.col("a.blk") == F.col("b.blk")) & (
            F.col("a.id") < F.col("b.id"))
    else:
        cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
