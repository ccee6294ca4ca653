"""Unit tests for the pure kernels (normalize, block key, scorers)."""

import math

import numpy as np
import pytest

from wdel_spark.functions import (
    normalize_text,
    block_key,
    jaro_winkler,
    levenshtein,
    hash_embed,
    cosine_pairs,
    pair_score,
)


def test_normalize_lowercases_and_folds_tradsimp():
    assert normalize_text("Hello  World") == "hello world"
    assert normalize_text("中國體育") == "中国体育"
    assert normalize_text(None) == ""
    assert normalize_text("  a,b;c!  ") == "a b c"


def test_block_key_transposition_invariant():
    a = normalize_text("acme industries")
    b = normalize_text("acme idnustries")  # adjacent swap
    assert block_key(a) == block_key(b)
    assert block_key("") == ""


def test_jaro_winkler_reference_values():
    # canonical published examples
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert jaro_winkler("", "abc") == 0.0


def test_levenshtein_basic():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("same", "same") == 0


def test_hash_embed_deterministic_unit_norm():
    v1 = hash_embed(["acme corp", "acme corp", ""])
    v2 = hash_embed(["acme corp", "acme corp", ""])
    np.testing.assert_array_equal(v1, v2)
    assert math.isclose(float(np.linalg.norm(v1[0])), 1.0, rel_tol=1e-5)
    assert float(np.linalg.norm(v1[2])) == 0.0
    # distinct strings -> distinct directions
    v3 = hash_embed(["zzz totally different"])
    assert float(v1[0] @ v3[0]) < 0.9


def test_cosine_pairs_handles_zero_vectors():
    a = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=np.float32)
    b = np.array([[1.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    out = cosine_pairs(a, b)
    assert out[0] == pytest.approx(1.0)
    assert out[1] == 0.0


def test_pair_score_monotonic_in_similarity():
    exact = pair_score("acme corp", "acme corp", 1.0)
    near = pair_score("acme corp", "acme crop", 0.8)
    far = pair_score("acme corp", "zzz", 0.0)
    assert exact > near > far
    assert exact == pytest.approx(1.0)
