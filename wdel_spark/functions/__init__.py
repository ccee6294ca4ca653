from wdel_spark.functions.textnorm import normalize_text, block_key, TRAD2SIMP
from wdel_spark.functions.scoring import (
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein,
    hash_embed,
    cosine_pairs,
    pair_score,
    pair_score_batch,
)

__all__ = [
    "normalize_text",
    "block_key",
    "TRAD2SIMP",
    "jaro_winkler",
    "jaro_winkler_batch",
    "levenshtein",
    "hash_embed",
    "cosine_pairs",
    "pair_score",
    "pair_score_batch",
]
