"""Deterministic text normalization & blocking-key generation.

Replicates the *intent* of the reference's string cleaning:

- Traditional->Simplified Chinese folding: reference uses HanziConv
  (`/root/reference/src/wikidata_process/process_string.py:13-15,72-75`).
  Here: a deterministic table of the most common mappings (extensible);
  hermetic — no external package.
- Lowercasing: reference lowercases final entity text
  (`/root/reference/src/candidate_generation/tokenization.py:107,184`).
- URI prefix strip intent (`process_string.py:5-8`) is handled where QIDs are
  parsed, not here.

The blocking key replaces the reference's faiss ANN index
(`/root/reference/src/candidate_generation/prediction.py:131-147`): mentions
and KB aliases that share a key become candidate pairs.  Key = the sorted
characters of the normalized string — invariant under the char-transposition
noise of the corpus, deterministic, one key per string, and cheap enough to
compute on 10^12 rows (O(len log len) per string inside an Arrow batch).
"""

from __future__ import annotations

import re
import unicodedata

# Common Traditional -> Simplified Chinese single-char mappings.  A real
# deployment swaps in a full OpenCC table behind the same dict; semantics
# (table-driven char translate) are identical.
TRAD2SIMP: dict[str, str] = {
    "體": "体", "國": "国", "學": "学", "會": "会", "語": "语", "說": "说",
    "愛": "爱", "時": "时", "間": "间", "書": "书", "東": "东", "馬": "马",
    "鳥": "鸟", "龍": "龙", "萬": "万", "與": "与", "門": "门", "問": "问",
    "風": "风", "雲": "云", "電": "电", "車": "车", "長": "长", "島": "岛",
    "羅": "罗", "灣": "湾", "漢": "汉", "華": "华", "發": "发", "經": "经",
    "樂": "乐", "歷": "历", "當": "当", "點": "点", "黨": "党", "醫": "医",
    "藝": "艺", "號": "号", "處": "处", "區": "区", "廣": "广", "應": "应",
}
_TRAD2SIMP_TRANS = str.maketrans(TRAD2SIMP)

# Collapse runs of whitespace; strip punctuation that never distinguishes
# entities (keeps CJK + alnum + spaces).
_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s一-鿿]+", re.UNICODE)


def normalize_text(s: str | None) -> str:
    """Canonical form used for both blocking and scoring.

    NFKC -> trad2simp -> lowercase -> strip punctuation -> collapse spaces.
    Pure function; called from pandas UDFs (batch loop) and the oracle.
    """
    if s is None:
        return ""
    s = unicodedata.normalize("NFKC", s)
    s = s.translate(_TRAD2SIMP_TRANS)
    s = s.lower()
    s = _PUNCT_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    return s


def block_key(norm: str) -> str:
    """Blocking key of an already-normalized string: sorted characters.

    Equal strings share a key; so do char-transpositions (the corpus noise
    model).  Anagram collisions are resolved downstream by the pair scorer.
    Empty normalized text gets an empty key and is filtered before the join.
    """
    return "".join(sorted(norm.replace(" ", "")))
