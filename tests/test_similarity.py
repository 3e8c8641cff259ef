"""Unit tests for sketching primitives (MinHash/LSH/SimHash/union-find)."""

import numpy as np

from pdf_entity_extraction_ray.functions.similarity import (
    MinHasher,
    UnionFind,
    char_shingles,
    hamming64,
    jaccard,
    simhash64,
    simhash64_batch,
    word_shingles,
)


def test_shingles():
    assert char_shingles("abc", 2) == {"ab", "bc"}
    assert char_shingles("a", 3) == {"a"}
    assert char_shingles("", 3) == set()
    assert word_shingles("a b c d", 3) == {"a b c", "b c d"}


def test_jaccard():
    assert jaccard({1, 2}, {2, 3}) == 1 / 3
    assert jaccard(set(), set()) == 1.0
    assert jaccard({1}, set()) == 0.0


class TestMinHash:
    def test_signature_estimates_jaccard(self):
        h = MinHasher(num_perm=256, seed=7)
        a = char_shingles("the quick brown fox jumps over the lazy dog", 3)
        b = char_shingles("the quick brown fox jumped over a lazy dog", 3)
        est = float(np.mean(h.signature(a) == h.signature(b)))
        true = jaccard(a, b)
        assert abs(est - true) < 0.15

    def test_deterministic_across_instances(self):
        s = char_shingles("hello world", 3)
        assert np.array_equal(MinHasher(64, 42).signature(s), MinHasher(64, 42).signature(s))

    def test_band_keys_collide_for_identical_sets(self):
        h = MinHasher(64, 42)
        s = char_shingles("identical", 3)
        assert h.band_keys(h.signature(s), 16) == h.band_keys(h.signature(s), 16)

    def test_band_keys_differ_for_disjoint_sets(self):
        h = MinHasher(64, 42)
        k1 = set(h.band_keys(h.signature(char_shingles("aaaaaaa", 3)), 16))
        k2 = set(h.band_keys(h.signature(char_shingles("zzzzzzz", 3)), 16))
        assert not (k1 & k2)


class TestSimHash:
    def test_similar_texts_low_hamming(self):
        a = simhash64("the quick brown fox jumps over the lazy dog".split())
        b = simhash64("the quick brown fox jumped over the lazy dog".split())
        c = simhash64("completely unrelated words entirely different tokens".split())
        assert hamming64(a, b) < hamming64(a, c)

    def test_batch_matches_scalar(self):
        lists = [["a", "b", "c"], [], ["x", "y"]]
        batch = simhash64_batch(lists)
        for i, tokens in enumerate(lists):
            assert int(batch[i]) == simhash64(tokens)


class TestUnionFind:
    def test_transitive_closure(self):
        uf = UnionFind()
        uf.union("a", "b")
        uf.union("b", "c")
        uf.union("x", "y")
        assert uf.find("a") == uf.find("c")
        assert uf.find("a") != uf.find("x")

    def test_deterministic_roots_independent_of_order(self):
        uf1, uf2 = UnionFind(), UnionFind()
        uf1.union("b", "a"); uf1.union("c", "b")
        uf2.union("a", "c"); uf2.union("c", "b")
        assert uf1.groups() == uf2.groups()

