from wdel_spark.functions.textnorm import normalize_text, block_key, TRAD2SIMP
from wdel_spark.functions.scoring import (
    jaro_winkler,
    levenshtein,
    hash_embed,
    cosine_pairs,
    pair_score,
)

__all__ = [
    "normalize_text",
    "block_key",
    "TRAD2SIMP",
    "jaro_winkler",
    "levenshtein",
    "hash_embed",
    "cosine_pairs",
    "pair_score",
]
