"""Deterministic synthetic interleaved text+media corpus + KB (stage S0).

Replaces the reference's external inputs (Wikidata dump + Hansel benchmark,
`/root/reference/src/wikidata_process/README.md`, `README.md:41-56`) with a
seeded generator so every test is hermetic.

Every row is a pure function of ``(seed, index)``:

    gen_entity(cfg, i)    -> one KB entity record (labels/desc/aliases)
    gen_document(cfg, d)  -> one document (interleaved spans) + gold mentions

so the *distributed* Spark generation (``spark.range`` -> ``mapInPandas``)
and the *local* pandas generation (used by the oracle and unit tests) emit
byte-identical rows — no driver-side 100 TB materialization, no ordering
dependence.

Schemas follow FIXTURES.md (§1 documents, §2 kb_entities, §3 kb_aliases,
§4 entity_vectors, §5 labeled_pairs, §6 redirects, §7 wikimedia_filter).

Noise model for mention spans (FIXTURES.md §1: char swaps, traditional
forms, alias synonyms; gold linkage known by construction):
  - exact alias copy                         (~55%)
  - adjacent-char transposition              (~30%)  [block-key invariant]
  - simplified->traditional zh char form     (~15%)  [normalization folds it]
A configurable fraction of mentions reference one deliberately *hot* alias
(skew fixture for the salted blocking join); ~1% of entities share an
ambiguous alias with another entity (same-block negative pairs).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import pandas as pd

from wdel_spark.functions.textnorm import normalize_text, block_key, TRAD2SIMP
from wdel_spark.functions.scoring import hash_embed, EMBED_DIM

SIMP2TRAD = {v: k for k, v in TRAD2SIMP.items()}
_S2T_TRANS = str.maketrans(SIMP2TRAD)

_EN_WORDS = (
    "acme nova orion delta vertex quantum zenith atlas cobalt onyx ember "
    "harbor summit cedar falcon granite juniper krypton lumen meridian "
    "nimbus prism quarry raven sable timber umber willow yonder zephyr "
    "corp labs group systems holdings industries partners works institute "
    "union city river peak bay north south east west central royal"
).split()

_ZH_CHARS = "华东风云电车长岛罗湾汉国学会语时间书马鸟龙万门问点区广应乐历医艺号处当党发经体爱说与"

_FILLER = (
    "the a data table scan join merge sort window filter group agg stream "
    "batch row column key value hash spark query fast slow big small part "
    "order line customer vector"
).split()


@dataclass(frozen=True)
class CorpusConfig:
    seed: int = 42
    n_entities: int = 2000
    n_docs: int = 500
    spans_min: int = 10
    spans_max: int = 40
    mention_frac: float = 0.35   # fraction of spans that are mentions
    media_frac: float = 0.15     # fraction of spans that are media
    hot_frac: float = 0.30       # fraction of mentions hitting the hot alias
    redirect_frac: float = 0.02
    wikimedia_frac: float = 0.01
    neardup_frac: float = 0.10   # entities whose label is an edit of i-1's
    zh_frac: float = 0.4         # entities with zh labels/aliases

    @property
    def hot_qid(self) -> str:
        return "Q1"

    @property
    def hot_alias(self) -> str:
        return "zenith prime atlas"


def _rng(cfg: CorpusConfig, namespace: str, idx: int) -> random.Random:
    return random.Random(f"{cfg.seed}:{namespace}:{idx}")


def _en_label(r: random.Random) -> str:
    return " ".join(r.choice(_EN_WORDS) for _ in range(3))


def _zh_label(r: random.Random) -> str:
    return "".join(r.choice(_ZH_CHARS) for _ in range(r.randint(3, 5)))


def _edit1(r: random.Random, s: str) -> str:
    """One deterministic character edit (substitution) — near-dup labels."""
    if len(s) < 2:
        return s + "x"
    i = r.randrange(len(s))
    pool = _EN_WORDS[0] + "xyzq"
    c = pool[r.randrange(len(pool))]
    return s[:i] + c + s[i + 1 :]


@lru_cache(maxsize=1 << 18)
def gen_entity(cfg: CorpusConfig, i: int) -> dict:
    """Pure function: KB entity record #i (1-based qid Q{i+1}).

    lru_cache: mention sampling re-derives entities constantly (each doc
    draws ~10); caching turns the per-mention cost into a dict hit.  The
    returned dict is treated as immutable by all callers."""
    r = _rng(cfg, "ent", i)
    qid = f"Q{i + 1}"
    has_zh = r.random() < cfg.zh_frac
    label_en = _en_label(r)
    if i > 0 and r.random() < cfg.neardup_frac:
        # near-duplicate of previous entity's label (edit distance 1) —
        # exercises the scorer's disambiguation, mirrors FIXTURES.md §2.
        prev = gen_entity_label_en(cfg, i - 1)
        label_en = _edit1(r, prev)
    label_zh = _zh_label(r) if has_zh else None
    desc_en = " ".join(r.choice(_FILLER) for _ in range(6))
    desc_zh = ("".join(r.choice(_ZH_CHARS) for _ in range(8))) if has_zh else None
    alts_en = [f"{label_en} {r.choice(_EN_WORDS)}" for _ in range(r.randint(0, 2))]
    alts_zh = (
        [_zh_label(r) for _ in range(r.randint(0, 2))] if has_zh else []
    )
    if i == 0:
        alts_en = [cfg.hot_alias] + alts_en  # the hot blocking key
    elif i % 97 == 13 and i >= 7:
        # ambiguous alias shared with another entity -> same-block negatives
        alts_en = alts_en + [gen_entity_label_en(cfg, i - 7)]
    # shallow P31/P279 paths (arrays-of-arrays; FIXTURES.md §2, capped);
    # per-hop en/zh class labels so the instance-of sections of the
    # byte-exact serializer (functions/entity_text.py) are exercised
    p31 = [[f"Q{r.randint(1, 50)}" for _ in range(r.randint(1, 3))]
           for _ in range(r.randint(0, 3))]
    p31_en = [[f"class{q[1:]}" for q in path] for path in p31]
    p31_zh = ([["类" + q[1:] for q in path] for path in p31]
              if has_zh else [[] for _ in p31])
    return {
        "qid": qid,
        "label_en": label_en,
        "label_zh": label_zh,
        "desc_en": desc_en,
        "desc_zh": desc_zh,
        "alt_en": alts_en,
        "alt_zh": alts_zh,
        "p31_qid": p31,
        "p31_en": p31_en,
        "p31_zh": p31_zh,
    }


def gen_entity_label_en(cfg: CorpusConfig, i: int) -> str:
    """Label of entity i without building the whole record (non-recursive
    base form — near-dup chains never nest more than one level)."""
    r = _rng(cfg, "ent", i)
    r.random()  # has_zh draw, keep stream aligned with gen_entity
    return _en_label(r)


def entity_feature_text(e: dict) -> str:
    """Serialized entity text — the scoring input.  Byte-exact zh-first
    text modeling (`tokenization.py:110-184` via functions/entity_text);
    feature = "title␟desc" exactly as the reference encoder consumes
    title + [ENT_TITLE_TAG] + desc (`tokenization.py:253-259`), with a
    single unit-separator char standing in for the special token."""
    from wdel_spark.functions.entity_text import entity_text_zh_first

    info = {
        "qid": e["qid"],
        "label": {"en": e.get("label_en"), "zh": e.get("label_zh")},
        "desc": {"en": e.get("desc_en"), "zh": e.get("desc_zh")},
        "alt": {"en": e.get("alt_en") or [], "zh": e.get("alt_zh") or []},
        "P31": {"qid": e.get("p31_qid") or [],
                "en": e.get("p31_en") or [],
                "zh": e.get("p31_zh") or []},
        "P279": {"qid": [], "en": [], "zh": []},
    }
    _, title, desc = entity_text_zh_first(info)
    return f"{title}\x1f{desc}"


def _entity_aliases(cfg: CorpusConfig, e: dict) -> list[tuple[str, str, bool]]:
    """(alias, lang, is_label) rows for one entity."""
    out: list[tuple[str, str, bool]] = []
    if e["label_en"]:
        out.append((e["label_en"], "en", True))
    if e["label_zh"]:
        out.append((e["label_zh"], "zh", True))
    out += [(a, "en", False) for a in e["alt_en"]]
    out += [(a, "zh", False) for a in e["alt_zh"]]
    return out


@lru_cache(maxsize=1 << 18)
def _entity_aliases_cached(cfg: CorpusConfig, i: int) -> tuple:
    return tuple(_entity_aliases(cfg, gen_entity(cfg, i)))


@lru_cache(maxsize=1 << 18)
def _redirect_dst(cfg: CorpusConfig, i: int) -> int | None:
    """Entity i redirects to entity j?  Deterministic per-index draw."""
    r = _rng(cfg, "redir", i)
    if i > 10 and r.random() < cfg.redirect_frac:
        return r.randrange(max(1, i // 2))
    return None


@lru_cache(maxsize=1 << 18)
def _is_wikimedia_internal(cfg: CorpusConfig, i: int) -> bool:
    r = _rng(cfg, "wm", i)
    return i > 20 and r.random() < cfg.wikimedia_frac


def _noisy_mention(r: random.Random, alias: str, lang: str) -> str:
    roll = r.random()
    if roll < 0.55 or len(alias) < 3:
        return alias
    if roll < 0.85 or lang != "zh":  # adjacent transposition — key-invariant
        i = r.randrange(len(alias) - 1)
        return alias[:i] + alias[i + 1] + alias[i] + alias[i + 2 :]
    return alias.translate(_S2T_TRANS)  # simp -> trad form


def _linkable(cfg: CorpusConfig, i: int) -> bool:
    return not _is_wikimedia_internal(cfg, i)


def gen_document(cfg: CorpusConfig, d: int) -> tuple[dict, list[dict]]:
    """Pure function: document #d -> (document row, gold mention rows).

    Document row: {doc_id, spans:[{kind,text,media_ref,offset}]}.
    Gold rows:    {doc_id, span_idx, gold_qid} (redirect-resolved gold).
    """
    r = _rng(cfg, "doc", d)
    doc_id = f"d{d:08d}"
    n_spans = r.randint(cfg.spans_min, cfg.spans_max)
    spans: list[dict] = []
    gold: list[dict] = []
    offset = 0
    for j in range(n_spans):
        roll = r.random()
        if roll < cfg.media_frac:
            kind, text, media = "media", "", f"img://{doc_id}/{j}"
        elif roll < cfg.media_frac + cfg.mention_frac:
            kind, media = "mention", ""
            if r.random() < cfg.hot_frac:
                ent_i, alias, lang = 0, cfg.hot_alias, "en"
            else:
                # draw a linkable entity (skip wikimedia-internal ones)
                for _ in range(8):
                    ent_i = r.randrange(cfg.n_entities)
                    if _linkable(cfg, ent_i):
                        break
                aliases = _entity_aliases_cached(cfg, ent_i)
                alias, lang, _ = aliases[r.randrange(len(aliases))]
            text = _noisy_mention(r, alias, lang)
            dst = _redirect_dst(cfg, ent_i)
            gold_qid = f"Q{dst + 1}" if dst is not None else f"Q{ent_i + 1}"
            gold.append({"doc_id": doc_id, "span_idx": j, "gold_qid": gold_qid})
        else:
            kind, media = "text", ""
            text = " ".join(r.choice(_FILLER) for _ in range(r.randint(3, 10)))
        spans.append({"kind": kind, "text": text, "media_ref": media,
                      "offset": offset})
        offset += max(len(text), 1) + 1
    return {"doc_id": doc_id, "spans": spans}, gold


# ---------------------------------------------------------------- pandas side

def gen_kb_pandas(cfg: CorpusConfig) -> dict[str, pd.DataFrame]:
    """All KB-side tables as pandas frames (small: O(n_entities))."""
    ents = [gen_entity(cfg, i) for i in range(cfg.n_entities)]
    kb_entities = pd.DataFrame(ents)

    alias_rows = []
    for i, e in enumerate(ents):
        for alias, lang, is_label in _entity_aliases(cfg, e):
            norm = normalize_text(alias)
            if not norm:
                continue
            alias_rows.append({
                "qid": e["qid"], "alias": alias, "norm_alias": norm,
                "block_key": block_key(norm), "lang": lang,
                "is_label": is_label,
            })
    kb_aliases = pd.DataFrame(alias_rows)

    feats = [entity_feature_text(e) for e in ents]
    vecs = hash_embed(feats, EMBED_DIM)
    entity_vectors = pd.DataFrame({
        "qid": [e["qid"] for e in ents],
        "vec": [v for v in vecs],
    })

    redir_rows = []
    for i in range(cfg.n_entities):
        dst = _redirect_dst(cfg, i)
        if dst is not None:
            redir_rows.append({"src_qid": f"Q{i + 1}", "dst_qid": f"Q{dst + 1}"})
    redirects = pd.DataFrame(redir_rows, columns=["src_qid", "dst_qid"])

    wm_rows = [{"qid": f"Q{i + 1}"} for i in range(cfg.n_entities)
               if _is_wikimedia_internal(cfg, i)]
    wikimedia_filter = pd.DataFrame(wm_rows, columns=["qid"])

    return {
        "kb_entities": kb_entities,
        "kb_aliases": kb_aliases,
        "entity_vectors": entity_vectors,
        "redirects": redirects,
        "wikimedia_filter": wikimedia_filter,
    }


def gen_documents_pandas(cfg: CorpusConfig, lo: int = 0, hi: int | None = None
                         ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Documents [lo, hi) + gold mentions as pandas frames."""
    hi = cfg.n_docs if hi is None else hi
    doc_rows, gold_rows = [], []
    for d in range(lo, hi):
        doc, gold = gen_document(cfg, d)
        doc_rows.append(doc)
        gold_rows.extend(gold)
    documents = pd.DataFrame(doc_rows, columns=["doc_id", "spans"])
    mention_gold = pd.DataFrame(
        gold_rows, columns=["doc_id", "span_idx", "gold_qid"])
    return documents, mention_gold


def gen_labeled_pairs_pandas(cfg: CorpusConfig, max_pairs: int = 5000
                             ) -> pd.DataFrame:
    """Gold mention pairs at the same blocking key (FIXTURES.md §5)."""
    _, gold = gen_documents_pandas(cfg)
    docs, _ = gen_documents_pandas(cfg)
    # mention text lookup
    mtext = {}
    for _, row in docs.iterrows():
        for j, s in enumerate(row["spans"]):
            if s["kind"] == "mention":
                mtext[(row["doc_id"], j)] = s["text"]
    gold = gold.copy()
    gold["block_key"] = [
        block_key(normalize_text(mtext[(r.doc_id, r.span_idx)]))
        for r in gold.itertuples()
    ]
    r = _rng(cfg, "pairs", 0)
    rows = []
    by_key: dict[str, list] = {}
    for rec in gold.itertuples():
        by_key.setdefault(rec.block_key, []).append(rec)
    for key, members in by_key.items():
        if len(members) < 2 or not key:
            continue
        n_draw = min(len(members) * 2, 50)
        for _ in range(n_draw):
            a, b = r.sample(members, 2)
            rows.append({
                "doc_id_a": a.doc_id, "span_idx_a": a.span_idx,
                "doc_id_b": b.doc_id, "span_idx_b": b.span_idx,
                "block_key": key,
                "same": a.gold_qid == b.gold_qid,
                "gold_qid_a": a.gold_qid, "gold_qid_b": b.gold_qid,
            })
            if len(rows) >= max_pairs:
                break
        if len(rows) >= max_pairs:
            break
    return pd.DataFrame(rows).drop_duplicates(
        subset=["doc_id_a", "span_idx_a", "doc_id_b", "span_idx_b"]
    ).reset_index(drop=True)


# ----------------------------------------------------------------- spark side

DOCUMENTS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
GOLD_SCHEMA = "doc_id string, span_idx int, gold_qid string"


def gen_corpus_spark(spark, cfg: CorpusConfig, n_partitions: int = 32):
    """Distributed S0: EVERY table via mapInPandas over an index range —
    documents over doc indices, KB tables over entity indices.  Each task
    generates its own slice from the pure per-index functions, so output
    is identical to the pandas path and nothing large ever materializes on
    the driver (the production shape: 93M entities / 10^12 docs are
    generated/read where they are processed).

    Returns dict of DataFrames: documents, mention_gold, kb_entities,
    kb_aliases, entity_vectors, redirects, wikimedia_filter.
    """
    from pyspark.sql import functions as F  # local import keeps module light

    def gen_flat_part(batches):
        # flat scalar columns: Arrow conversion of python nested structs is
        # ~10x slower than flat columns — nest JVM-side instead
        for pdf in batches:
            cols = {"doc_id": [], "span_idx": [], "kind": [], "text": [],
                    "media_ref": [], "offset": []}
            for d in pdf["id"].tolist():
                doc, _ = gen_document(cfg, int(d))
                for j, s in enumerate(doc["spans"]):
                    cols["doc_id"].append(doc["doc_id"])
                    cols["span_idx"].append(j)
                    cols["kind"].append(s["kind"])
                    cols["text"].append(s["text"])
                    cols["media_ref"].append(s["media_ref"])
                    cols["offset"].append(s["offset"])
            yield pd.DataFrame(cols)

    def gen_gold_part(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"].tolist():
                _, gold = gen_document(cfg, int(d))
                rows.extend(gold)
            yield pd.DataFrame(rows, columns=["doc_id", "span_idx",
                                              "gold_qid"])

    rng_df = spark.range(0, cfg.n_docs, 1, n_partitions)
    spans_flat = rng_df.mapInPandas(
        gen_flat_part,
        schema="doc_id string, span_idx int, kind string, text string, "
               "media_ref string, offset int")
    documents = spans_flat.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(
                "span_idx", "kind", "text", "media_ref", "offset"))),
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset")),
        ).alias("spans"))
    mention_gold = rng_df.mapInPandas(gen_gold_part, schema=GOLD_SCHEMA)

    ent_parts = max(4, min(n_partitions, cfg.n_entities // 500 or 1))
    ent_rng = spark.range(0, cfg.n_entities, 1, ent_parts)

    def gen_alias_part(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                e = gen_entity(cfg, int(i))
                for alias, lang, is_label in _entity_aliases(cfg, e):
                    norm = normalize_text(alias)
                    if not norm:
                        continue
                    rows.append((e["qid"], alias, norm, block_key(norm),
                                 lang, is_label))
            yield pd.DataFrame(rows, columns=[
                "qid", "alias", "norm_alias", "block_key", "lang",
                "is_label"])

    def gen_vec_part(batches):
        for pdf in batches:
            idxs = [int(i) for i in pdf["id"].tolist()]
            ents = [gen_entity(cfg, i) for i in idxs]
            vecs = hash_embed([entity_feature_text(e) for e in ents],
                              EMBED_DIM)
            yield pd.DataFrame({
                "qid": [e["qid"] for e in ents],
                "vec": [v.tolist() for v in vecs],
            })

    def gen_entity_part(batches):
        for pdf in batches:
            rows = [gen_entity(cfg, int(i)) for i in pdf["id"].tolist()]
            yield pd.DataFrame(rows, columns=[
                "qid", "label_en", "label_zh", "desc_en", "desc_zh",
                "alt_en", "alt_zh", "p31_qid", "p31_en", "p31_zh"])

    def gen_redirect_part(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                dst = _redirect_dst(cfg, int(i))
                if dst is not None:
                    rows.append((f"Q{int(i) + 1}", f"Q{dst + 1}"))
            yield pd.DataFrame(rows, columns=["src_qid", "dst_qid"])

    def gen_wm_part(batches):
        for pdf in batches:
            rows = [(f"Q{int(i) + 1}",) for i in pdf["id"].tolist()
                    if _is_wikimedia_internal(cfg, int(i))]
            yield pd.DataFrame(rows, columns=["qid"])

    return {
        "documents": documents,
        "spans_flat": spans_flat,
        "mention_gold": mention_gold,
        "kb_aliases": ent_rng.mapInPandas(
            gen_alias_part,
            schema="qid string, alias string, norm_alias string, "
                   "block_key string, lang string, is_label boolean"),
        "entity_vectors": ent_rng.mapInPandas(
            gen_vec_part, schema="qid string, vec array<float>"),
        "kb_entities": ent_rng.mapInPandas(
            gen_entity_part,
            schema="qid string, label_en string, label_zh string, "
                   "desc_en string, desc_zh string, alt_en array<string>, "
                   "alt_zh array<string>, p31_qid array<array<string>>, "
                   "p31_en array<array<string>>, "
                   "p31_zh array<array<string>>"),
        "redirects": ent_rng.mapInPandas(
            gen_redirect_part, schema="src_qid string, dst_qid string"),
        "wikimedia_filter": ent_rng.mapInPandas(
            gen_wm_part, schema="qid string"),
    }
