"""Entity text modeling (SURVEY §2 F1/F2) — byte-exact with the reference.

The reference serializes each nested entity record into a (title, desc)
string pair that is THE scoring input (`/root/reference/src/
candidate_generation/tokenization.py:110-184` zh-first variant used by the
serving pipeline; `tokenization.py:27-107` en-first variant used by the
en-zh encoder).  SURVEY.md pins these as must-match-byte-for-byte.

Both variants emit the same per-language segments —

  zh:  名称：L；  描述：D；  别名：a/b；  是以下实体的实例：p/q；  是以下实体的子类：p/q；
  en:  name: L;  description: D;  alias: a/b;  instance_of: p/q;  subclass_of: p/q;

— and differ only in interleaving: zh-first alternates zh/en per section;
en-first emits every en section, then every zh section.  Title is the
labels joined by "/" in variant order; when BOTH title and desc are empty
the qid is used for both.  Everything is lowercased at the end.

Reference quirks preserved deliberately (byte parity beats tidiness):
  - a missing first-language label still contributes the "/" separator to
    the title (e.g. zh-first title for an en-only entity is "/label");
  - empty relation paths are skipped entirely (no empty segment);
  - alias segments are emitted only when the joined string is non-empty.

Pure kernels here; `title_desc_columns` is the Catalyst (JVM, codegen)
equivalent over `kb_io.ENTITY_SCHEMA` structs, tested byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SEG = {
    "zh": {"label": ("名称：", "；"), "desc": ("描述：", "；"),
           "alt": ("别名：", "；"), "p31": ("是以下实体的实例：", "；"),
           "p279": ("是以下实体的子类：", "；")},
    "en": {"label": ("name: ", ";"), "desc": ("description: ", ";"),
           "alt": ("alias: ", ";"), "p31": ("instance_of: ", ";"),
           "p279": ("subclass_of: ", ";")},
}
_SECTIONS = ("label", "desc", "alt", "p31", "p279")


def _segments(info: dict, lang: str) -> dict[str, list[str]]:
    """Per-section serialized segments for one language (possibly empty)."""
    seg = _SEG[lang]
    out: dict[str, list[str]] = {s: [] for s in _SECTIONS}
    label = info["label"][lang]
    if label is not None:
        out["label"].append(seg["label"][0] + label + seg["label"][1])
    desc = info["desc"][lang]
    if desc is not None:
        out["desc"].append(seg["desc"][0] + desc + seg["desc"][1])
    alt = "/".join(info["alt"][lang])
    if alt:
        out["alt"].append(seg["alt"][0] + alt + seg["alt"][1])
    for rel in ("p31", "p279"):
        for path in info[rel.upper()][lang]:
            if path:
                out[rel].append(seg[rel][0] + "/".join(path) + seg[rel][1])
    return out


def _title(info: dict, lang_order: tuple[str, str]) -> str:
    first, second = (info["label"][lang] for lang in lang_order)
    title = "" if first is None else first
    if second is not None:
        title += "/" + second          # reference keeps the bare "/" when
    return title                       # the first label is absent


def entity_text_zh_first(info: dict) -> tuple[str, str, str]:
    """(qid, title, desc), zh-before-en per section —
    `tokenization.py:110-184` byte-for-byte."""
    zh, en = _segments(info, "zh"), _segments(info, "en")
    desc = "".join(
        s for sec in _SECTIONS for s in zh[sec] + en[sec])
    title = _title(info, ("zh", "en"))
    if not title and not desc:
        title = desc = info["qid"]
    return info["qid"], title.lower(), desc.lower()


def entity_text_en_first(info: dict) -> tuple[str, str, str]:
    """(qid, title, desc), all en sections then all zh —
    `tokenization.py:27-107` byte-for-byte."""
    zh, en = _segments(info, "zh"), _segments(info, "en")
    desc = ("".join(s for sec in _SECTIONS for s in en[sec])
            + "".join(s for sec in _SECTIONS for s in zh[sec]))
    title = _title(info, ("en", "zh"))
    if not title and not desc:
        title = desc = info["qid"]
    return info["qid"], title.lower(), desc.lower()


# ---------------------------------------------------------- Catalyst form

def _seg_col(txt: Column, prefix: str, suffix: str) -> Column:
    return F.when(txt.isNotNull(),
                  F.concat(F.lit(prefix), txt, F.lit(suffix))
                  ).otherwise(F.lit(""))


def _alt_col(arr: Column, prefix: str, suffix: str) -> Column:
    joined = F.concat_ws("/", F.coalesce(arr, F.array().cast(
        "array<string>")))
    return F.when(F.length(joined) > 0,
                  F.concat(F.lit(prefix), joined, F.lit(suffix))
                  ).otherwise(F.lit(""))


def _paths_col(paths: Column, prefix: str, suffix: str) -> Column:
    return F.concat_ws("", F.transform(
        F.coalesce(paths, F.array().cast("array<array<string>>")),
        lambda p: F.when(
            F.size(p) > 0,
            F.concat(F.lit(prefix), F.concat_ws("/", p), F.lit(suffix)),
        ).otherwise(F.lit("")),
    ))


def _lang_sections(e: Column, lang: str) -> dict[str, Column]:
    seg = _SEG[lang]
    return {
        "label": _seg_col(e["label"][lang], *seg["label"]),
        "desc": _seg_col(e["desc"][lang], *seg["desc"]),
        "alt": _alt_col(e["alt"][lang], *seg["alt"]),
        "p31": _paths_col(e["p31"][lang], *seg["p31"]),
        "p279": _paths_col(e["p279"][lang], *seg["p279"]),
    }


def title_desc_columns(e: Column, variant: str = "zh_first"
                       ) -> tuple[Column, Column]:
    """JVM-side (title, desc) columns over an ENTITY_SCHEMA struct —
    byte-identical to the python kernels (pinned by test)."""
    zh, en = _lang_sections(e, "zh"), _lang_sections(e, "en")
    if variant == "zh_first":
        desc = F.concat(*[c for sec in _SECTIONS for c in (zh[sec], en[sec])])
        first, second = e["label"]["zh"], e["label"]["en"]
    elif variant == "en_first":
        desc = F.concat(*[en[sec] for sec in _SECTIONS],
                        *[zh[sec] for sec in _SECTIONS])
        first, second = e["label"]["en"], e["label"]["zh"]
    else:
        raise ValueError(f"unknown variant {variant!r}")
    title = F.concat(
        F.coalesce(first, F.lit("")),
        F.when(second.isNotNull(), F.concat(F.lit("/"), second))
        .otherwise(F.lit("")),
    )
    empty = (F.length(title) == 0) & (F.length(desc) == 0)
    return (
        F.lower(F.when(empty, e["qid"]).otherwise(title)),
        F.lower(F.when(empty, e["qid"]).otherwise(desc)),
    )
