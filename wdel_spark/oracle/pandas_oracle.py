"""Reference oracle: the exact pipeline semantics in pure pandas/numpy.

Plays the role the labeled Hansel benchmark plays for the reference
(SURVEY.md §5 — eval-as-test): an independent, driver-local implementation
of blocking + scoring + top-1 + transitive clustering, sharing only the
*kernels* (normalize/block_key/score) with the Spark build.  The Spark
pipeline must reproduce its clusters with pairwise F1 ≥ 0.99 (gate: 1.0).

Deliberately different mechanics from the Spark side — merge instead of
shuffle join, union-find instead of large-star/small-star — so structural
bugs (lost rows, wrong tie-breaks, nondeterministic dedup) can't cancel
out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from wdel_spark.functions.textnorm import normalize_text, block_key
from wdel_spark.functions.scoring import (
    hash_embed, seq_cosine_batch, pair_score, EMBED_DIM)


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def run_oracle(
    documents: pd.DataFrame,
    kb_aliases: pd.DataFrame,
    entity_vectors: pd.DataFrame,
    redirects: pd.DataFrame | None = None,
    wikimedia_filter: pd.DataFrame | None = None,
    top_k: int = 10,
    score_threshold: float = 0.3,
) -> dict:
    """Returns {mentions, assignments, clusters} pandas frames.

    clusters: (doc_id, span_idx, cluster_key) where cluster_key is an
    arbitrary-but-consistent label (compare as a partition, not by value).
    """
    # S1: extract + featurize mentions
    rows = []
    for rec in documents.itertuples():
        for j, s in enumerate(rec.spans):
            kind = s["kind"] if isinstance(s, dict) else s[0]
            text = s["text"] if isinstance(s, dict) else s[1]
            if kind == "mention":
                norm = normalize_text(text)
                rows.append((rec.doc_id, j, text, norm, block_key(norm)))
    mentions = pd.DataFrame(
        rows, columns=["doc_id", "span_idx", "mention", "norm_mention",
                       "block_key"])
    if len(mentions):
        mvecs = hash_embed(mentions["norm_mention"].tolist(), EMBED_DIM)
    else:
        mvecs = np.zeros((0, EMBED_DIM), dtype=np.float32)

    # KB prep: redirect-resolve, wikimedia anti-filter, dedupe, vectors
    kb = kb_aliases.copy()
    if redirects is not None and len(redirects):
        rmap = dict(zip(redirects["src_qid"], redirects["dst_qid"]))
        kb["qid"] = kb["qid"].map(lambda q: rmap.get(q, q))
    if wikimedia_filter is not None and len(wikimedia_filter):
        kb = kb[~kb["qid"].isin(set(wikimedia_filter["qid"]))]
    kb = kb.drop_duplicates(subset=["qid", "block_key", "norm_alias"])
    evec = dict(zip(entity_vectors["qid"],
                    [np.asarray(v, dtype=np.float32)
                     for v in entity_vectors["vec"]]))
    kb = kb[kb["qid"].isin(evec.keys())]

    # S2: blocking join
    m = mentions[mentions["block_key"] != ""].copy()
    m["m_row"] = np.arange(len(mentions))[mentions["block_key"] != ""]
    pairs = m.merge(kb[kb["block_key"] != ""], on="block_key",
                    suffixes=("", "_kb"))

    # S4: score
    if len(pairs):
        mv = mvecs[pairs["m_row"].to_numpy()]
        ev = np.stack([evec[q] for q in pairs["qid"]])
        # sequential-double cosine — bit-equal to the Spark JVM fold
        cos = seq_cosine_batch(mv, ev)
        pairs["score"] = [
            pair_score(mn, an, c)
            for mn, an, c in zip(pairs["norm_mention"], pairs["norm_alias"],
                                 cos)
        ]
    else:
        pairs["score"] = pd.Series(dtype=float)

    # S5: per-(mention,qid) max, then top-1 with (score desc, qid asc)
    per_pair = (
        pairs.groupby(["doc_id", "span_idx", "qid"], as_index=False)["score"]
        .max()
    )
    per_pair = per_pair.sort_values(
        ["doc_id", "span_idx", "score", "qid"],
        ascending=[True, True, False, True],
        kind="mergesort",
    )
    top1 = per_pair.groupby(["doc_id", "span_idx"], as_index=False).first()
    assignments = top1[top1["score"] >= score_threshold].copy()

    # S6: transitive clustering via union-find (mention<->qid bipartite)
    uf = _UnionFind()
    for rec in assignments.itertuples():
        uf.union(("m", rec.doc_id, rec.span_idx), ("e", rec.qid))
    out = []
    for rec in mentions.itertuples():
        node = ("m", rec.doc_id, rec.span_idx)
        key = uf.find(node) if node in uf.parent else node
        out.append((rec.doc_id, rec.span_idx, str(key)))
    clusters = pd.DataFrame(out, columns=["doc_id", "span_idx",
                                          "cluster_key"])
    return {"mentions": mentions, "assignments": assignments,
            "clusters": clusters}


def pairwise_f1(
    pred: pd.DataFrame,
    gold: pd.DataFrame,
    pairs: pd.DataFrame,
    pred_col: str = "cluster_id",
    gold_col: str = "cluster_key",
) -> float:
    """Pairwise F1 over an explicit labeled pair set.

    ``pred``/``gold``: (doc_id, span_idx, <cluster col>).
    ``pairs``: (doc_id_a, span_idx_a, doc_id_b, span_idx_b[, same]) — if a
    boolean ``same`` column exists it is the gold signal; otherwise gold
    co-membership is derived from ``gold``.
    """
    def lab(df, col):
        return {(r.doc_id, r.span_idx): getattr(r, col)
                for r in df.itertuples()}

    pl = lab(pred, pred_col)
    gl = lab(gold, gold_col) if gold is not None else None
    tp = fp = fn = 0
    for r in pairs.itertuples():
        a = (r.doc_id_a, r.span_idx_a)
        b = (r.doc_id_b, r.span_idx_b)
        if a not in pl or b not in pl:
            continue
        p_same = pl[a] == pl[b]
        if hasattr(r, "same"):
            g_same = bool(r.same)
        else:
            if gl is None or a not in gl or b not in gl:
                continue
            g_same = gl[a] == gl[b]
        if p_same and g_same:
            tp += 1
        elif p_same:
            fp += 1
        elif g_same:
            fn += 1
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)
