"""Similarity / sketching primitives: shingles, MinHash, LSH bands, SimHash.

The reference's entity resolution does an O(n^2) pairwise similarity pass
over all surface forms (D2, src/ollama_entity_extraction/OllamaNERExtractor.py:156-184).
At web scale that is replaced by MinHash-LSH blocking: only pairs sharing an
LSH band bucket are tested with the exact predicate
(:func:`..functions.textnorm.surfaces_similar`), then union-find closes the
transitive groups the reference grows via ``indexes_to_skip``.

All hashing is seeded/content-derived (blake2b) — deterministic across
workers, runs and parallelism levels.  MinHash signatures are computed
vectorized with numpy universal hashing (a*x+b mod p).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE_P = np.uint64((1 << 61) - 1)


def _stable_hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _md5_hash64(data: bytes) -> int:
    """Little-endian first 8 md5 bytes — DuckDB ``md5_number_upper``, so
    simhash values are exactly reproducible in SQL."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def char_shingles(text: str, k: int = 3) -> set[str]:
    """Character k-shingles of ``text`` (padded when shorter than k)."""
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def word_shingles(text: str, k: int = 3) -> set[str]:
    """Word k-gram shingles (space-joined)."""
    words = text.split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


class MinHasher:
    """Vectorized MinHash over token/shingle sets.

    ``num_perm`` universal hash functions ``h_i(x) = (a_i*x + b_i) mod p``
    with seeded coefficients; signature entry i = min over the set's base
    hashes.  Build once (per actor), reuse per batch.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)

    def signature(self, shingles: set[str]) -> np.ndarray:
        """uint64 signature of length ``num_perm`` (all-max for empty sets)."""
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.fromiter(
            (_stable_hash64(s.encode("utf-8")) for s in shingles),
            dtype=np.uint64,
            count=len(shingles),
        )
        # (num_perm, n) universal hashes; modmul in python-int free uint64 space
        prod = np.multiply.outer(self.a, base)  # wraps mod 2^64 — fine for mixing
        hashed = (prod + self.b[:, None]) % _MERSENNE_P
        return hashed.min(axis=1)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[str]:
        """LSH band bucket keys: hash of each contiguous signature band.
        Two sets share a key iff a whole band matches -> candidate pair."""
        rows = self.num_perm // bands
        keys = []
        for band_index in range(bands):
            chunk = sig[band_index * rows : (band_index + 1) * rows]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            keys.append(f"{band_index}:{digest}")
        return keys


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over tokens: sum +/-1 per bit weighted by token hash."""
    if not tokens:
        return 0
    bits = np.zeros(64, dtype=np.int64)
    for token in tokens:
        h = _md5_hash64(token.encode("utf-8"))
        for bit in range(64):
            bits[bit] += 1 if (h >> bit) & 1 else -1
    value = 0
    for bit in range(64):
        if bits[bit] > 0:
            value |= 1 << bit
    return value


def simhash64_batch(token_lists: list[list[str]]) -> np.ndarray:
    """Vectorized SimHash for a batch of token lists -> uint64 array."""
    out = np.empty(len(token_lists), dtype=np.uint64)
    for i, tokens in enumerate(token_lists):
        if not tokens:
            out[i] = 0
            continue
        hashes = np.fromiter(
            (_md5_hash64(t.encode("utf-8")) for t in tokens),
            dtype=np.uint64,
            count=len(tokens),
        )
        # (n, 64) bit matrix -> column sums -> sign
        bit_matrix = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = 2 * bit_matrix.sum(axis=0) - len(tokens)
        bits = (votes > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class UnionFind:
    """Union-find with path compression; closes the transitive similarity
    groups the reference builds sequentially (OllamaNERExtractor.py:156-184)."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        parent = self.parent
        if x not in parent:
            parent[x] = x
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins, independent of union order
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def groups(self) -> dict:
        """root -> sorted members, deterministic."""
        out: dict = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), []).append(x)
        return {root: sorted(members) for root, members in sorted(out.items())}
