"""Dedup family + multimodal plumbing tests (hermetic, tiny frames)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wdel_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_kernel,
    simhash_column,
    simhash_neardup_pairs,
    embedding_neardup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [
        ("d1", base),
        ("d2", base),                                  # exact dup
        ("d3", base.replace("quick", "quik")),         # near dup
        ("d4", "completely different text about spark shuffles and joins"),
        ("d5", "another unrelated document mentioning window functions"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_finds_dups_not_unrelated(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert pairs.get(("d1", "d2")) == 4          # identical: all bands
    assert ("d1", "d3") in pairs or ("d3", "d1") in pairs  # near dup
    assert ("d1", "d4") not in pairs
    assert ("d4", "d5") not in pairs


def test_ngram_jaccard_values(spark, docs):
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d1", "d4")], "doc_a string, doc_b string")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard(docs, pairs).collect()}
    assert out[("d1", "d2")] == 1.0
    assert out[("d1", "d4")] < 0.2


def test_simhash_kernel_matches_spark(docs):
    rows = docs.collect()
    want = dict(zip([r["doc_id"] for r in rows],
                    simhash_kernel([r["text"] for r in rows])))
    got = {r["doc"]: r["simhash"] for r in simhash_column(docs).collect()}
    assert got == {k: int(v) for k, v in want.items()}


def test_simhash_neardup_pairs(docs):
    out = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_neardup_pairs(docs, max_hamming=16).collect()}
    assert out[("d1", "d2")] == 0
    assert ("d1", "d4") not in out
    # Spark output == pure-kernel reference: pairs share a 16-bit band AND
    # pass the hamming verify (banding guarantees recall only for <=3 bit
    # flips — d1/d3 at hamming 8 may legitimately be missed)
    rows = docs.collect()
    sims = dict(zip([r["doc_id"] for r in rows],
                    (int(x) for x in simhash_kernel(
                        [r["text"] for r in rows]))))
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sims[a] ^ sims[b]).count("1")
            shares = any(((sims[a] >> (k * 16)) & 0xFFFF)
                         == ((sims[b] >> (k * 16)) & 0xFFFF)
                         for k in range(4))
            if shares and ham <= 16:
                want[(a, b)] = ham
    assert out == want


def test_embedding_neardup_blocked_matches_brute(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.randn(16).astype("float32")  # near dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(
        emb, threshold=0.95, sign_bits=0).collect()}
    blocked = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(
        emb, threshold=0.95, sign_bits=4).collect()}
    assert (0, 1) in brute
    assert blocked <= brute          # blocking may only lose pairs
    assert (0, 1) in blocked         # near-identical shares the orthant


def test_embedding_neardup_banded_recall_and_cap(spark):
    """Band-OR LSH governance (r2 VERDICT #6): on a cluster-heavy fixture
    the banded candidate set must recover >=95% of true near-dup pairs
    (boundary-straddling pairs are exactly what single-orthant blocking
    lost), while every (band, key) bucket stays within the cap."""
    import numpy as np

    rng = np.random.RandomState(42)
    dim, n_clusters, per = 16, 12, 12
    centers = rng.randn(n_clusters, dim).astype("float64")
    vecs = []
    for c in centers:
        for _ in range(per):
            vecs.append(c + 0.05 * rng.randn(dim))
    vecs = np.array(vecs)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    brute = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(
        emb, threshold=0.95, sign_bits=0).collect()}
    banded = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(
        emb, threshold=0.95, sign_bits=4, n_bands=4,
        max_block=10_000).collect()}
    assert len(brute) >= 100          # the fixture is genuinely pair-heavy
    assert banded <= brute
    recall = len(banded & brute) / len(brute)
    assert recall >= 0.95, recall

    # cap governance: with a tiny cap the op still runs, output remains a
    # subset, and no surviving (band, key) bucket exceeded the cap --
    # checked directly against the key construction
    capped = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(
        emb, threshold=0.95, sign_bits=4, n_bands=4,
        max_block=20).collect()}
    assert capped <= banded
    from collections import Counter
    sizes = Counter()
    for v in vecs:
        for k in range(4):
            key = "".join("1" if x >= 0 else "0"
                          for x in v[k * 4:(k + 1) * 4])
            sizes[(k, key)] += 1
    kept = {b for b, n in sizes.items() if n <= 20}
    # every capped pair must share at least one SURVIVING bucket
    for ia, ib in capped:
        shared = False
        for k in range(4):
            ka = "".join("1" if x >= 0 else "0"
                         for x in vecs[ia][k * 4:(k + 1) * 4])
            kb = "".join("1" if x >= 0 else "0"
                         for x in vecs[ib][k * 4:(k + 1) * 4])
            if ka == kb and (k, ka) in kept:
                shared = True
        assert shared, (ia, ib)

    # the dropped-bucket lineage counter (ADVICE r3) reports exactly the
    # buckets the cap removed
    from wdel_spark.operators.dedup import banded_dropped_buckets
    dropped = {(r["band"], r["key"]): r["bucket_size"]
               for r in banded_dropped_buckets(
                   emb, sign_bits=4, n_bands=4, max_block=20).collect()}
    assert dropped == {b: n for b, n in sizes.items() if n > 20}

    # max_block=None (the default) is uncapped: identical to a huge cap
    uncapped = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(
        emb, threshold=0.95, sign_bits=4, n_bands=4).collect()}
    assert uncapped == banded


def test_media_pipeline_plumbing(spark, corpus_spark):
    from wdel_spark.functions.media import (
        media_table_from_documents,
        extract_media_features,
    )

    media = media_table_from_documents(corpus_spark["documents"])
    n_media = media.count()
    assert n_media > 0
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == n_media
    # real decode (r5): payload is a genuine 24-bit BMP; width/height in
    # the result must equal what an independent header parse reads, and
    # the feature fingerprints the decoded identity incl. pixel checksum
    import struct
    from wdel_spark.functions.media import synth_bmp

    r = rows[0]
    payload = synth_bmp(r["media_ref"])
    assert payload[:2] == b"BM"
    _hsz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    assert bpp == 24
    assert (r["width"], r["height"]) == (w, h)
    assert r["n_bytes"] == len(payload) == 54 + (3 * w + 3) // 4 * 4 * h
    checksum = sum(payload[54:])
    assert r["feature_id"] == hashlib.md5(
        f"{r['media_ref']}:{w}x{h}:{checksum}".encode()).hexdigest()[:16]
    assert 1 <= w <= 256 and 1 <= h <= 256


def test_media_decode_rejects_corrupt_payloads():
    """The real decoder actually validates bytes: wrong magic and
    truncated/odd bit depth raise instead of emitting features."""
    import pytest as _pytest
    from wdel_spark.functions.media import decode_bmp, synth_bmp

    good = synth_bmp("img://doc-1/3")
    w, h, _ = decode_bmp(good)
    assert w >= 1 and h >= 1
    with _pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])
    bad_depth = bytearray(good)
    bad_depth[28] = 8  # biBitCount LSB: 24 -> 8
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad_depth))


def test_minhash_dropped_buckets_counter(spark):
    """The MinHash bucket-cap drop must be observable (mirror of the
    embedding-LSH counter): a boilerplate shingle shared by every doc
    forms a bucket above a tiny cap, shows up in the counter, and its
    pairs vanish from the capped candidate set."""
    from wdel_spark.operators.dedup import (
        minhash_dropped_buckets, minhash_lsh_pairs)

    boiler = "COMMON-HEADER-" * 3
    rows = [(str(i), boiler + f"unique tail {i} " + "x" * i)
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    dropped = minhash_dropped_buckets(docs, max_bucket=4).collect()
    assert dropped, "shared-boilerplate bucket not reported"
    assert all(r["bucket_size"] > 4 for r in dropped)
    capped = minhash_lsh_pairs(docs, max_bucket=4).collect()
    uncapped = minhash_lsh_pairs(docs, max_bucket=1000).collect()
    assert len(capped) < len(uncapped)
