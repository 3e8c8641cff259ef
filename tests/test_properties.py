"""Property-based tests (hypothesis) for the similarity / span kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_entity_extraction_ray.functions.spans import remove_overlapping
from pdf_entity_extraction_ray.functions.textnorm import (
    ascii_fold,
    levenshtein_ratio,
    normalize_ws,
    surface_norm,
)

TEXT = st.text(alphabet=st.characters(codec="utf-8", categories=["L", "N", "P", "Z"]), max_size=40)
SHORT = st.text(alphabet="abcdef ", max_size=12)


def _levenshtein_dp(a: str, b: str) -> int:
    """Reference O(n*m) DP with substitution cost 2 (Levenshtein.ratio
    semantics) — the oracle for the bit-parallel implementation."""
    n, m = len(a), len(b)
    prev = list(range(0, 2 * (m + 1), 2))[: m + 1]
    prev = [j for j in range(m + 1)]
    # distances with sub cost 2 == n + m - 2*LCS; compute LCS by DP
    lcs_prev = [0] * (m + 1)
    for i in range(1, n + 1):
        lcs_cur = [0] * (m + 1)
        for j in range(1, m + 1):
            if a[i - 1] == b[j - 1]:
                lcs_cur[j] = lcs_prev[j - 1] + 1
            else:
                lcs_cur[j] = max(lcs_prev[j], lcs_cur[j - 1])
        lcs_prev = lcs_cur
    return n + m - 2 * lcs_prev[m]


@settings(max_examples=200, deadline=None)
@given(SHORT, SHORT)
def test_levenshtein_ratio_matches_dp_oracle(a, b):
    total = len(a) + len(b)
    expected = 1.0 if total == 0 else (total - _levenshtein_dp(a, b)) / total
    assert abs(levenshtein_ratio(a, b) - expected) < 1e-12


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_normalize_ws_idempotent_and_single_spaced(t):
    out = normalize_ws(t)
    assert normalize_ws(out) == out
    assert "  " not in out and out == out.strip()


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_ascii_fold_is_ascii_for_latin(t):
    folded = ascii_fold(t)
    # folding twice changes nothing
    assert ascii_fold(folded) == folded


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_surface_norm_idempotent(t):
    assert surface_norm(surface_norm(t)) == surface_norm(t)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 10)).map(
            lambda p: {
                "text": "x" * p[1],
                "entity_label": "X",
                "start_index": p[0],
                "end_index": p[0] + p[1],
            }
        ),
        max_size=12,
    )
)
def test_remove_overlapping_yields_disjoint_sorted_spans(spans):
    kept = remove_overlapping(spans)
    for prev, cur in zip(kept, kept[1:]):
        assert prev["end_index"] <= cur["start_index"]
    # every input span either kept or overlaps something kept
    for s in spans:
        assert any(
            not (s["end_index"] <= k["start_index"] or s["start_index"] >= k["end_index"])
            for k in kept
        )


# --- round-3 op kernels -----------------------------------------------------

PII_TEXT = st.text(
    alphabet="abc@._%+-0123456789 <>EMAILIP", max_size=60
)


@settings(max_examples=200, deadline=None)
@given(PII_TEXT)
def test_pii_redaction_idempotent_and_clean(t):
    """Redacting twice == redacting once, and the output never contains a
    redactable email/IPv4 (the placeholders themselves are not matches)."""
    import pyarrow as pa

    from pdf_entity_extraction_ray.ops.text import (
        _PII_EMAIL,
        _PII_IPV4,
        redact_pii_batch,
    )

    batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([t])})
    once = redact_pii_batch(batch)
    red = once.column("redacted").to_pylist()[0]
    again = redact_pii_batch(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([red])})
    )
    assert again.column("redacted").to_pylist()[0] == red
    assert not _PII_EMAIL.search(red) and not _PII_IPV4.search(red)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=30))
def test_hll_rho_matches_naive_bit_scan(vals):
    """_hll_partial's rho equals a naive MSB-side first-set-bit scan."""
    import numpy as np

    from pdf_entity_extraction_ray.functions.similarity import _md5_hash64
    from pdf_entity_extraction_ray.ops.dedup import _stable_hash64  # noqa: F401
    from pdf_entity_extraction_ray.ops.sketch import HLL_P, _hll_partial

    toks = {f"t{v}" for v in vals}
    regs = _hll_partial(toks, HLL_P)
    w_bits = 64 - HLL_P
    naive = {}
    for t in toks:
        h = _md5_hash64(t.encode())
        b, w = h >> w_bits, h & ((1 << w_bits) - 1)
        rho = 0
        for i in range(1, w_bits + 1):
            if (w >> (w_bits - i)) & 1:
                rho = i
                break
        naive[b] = max(naive.get(b, 0), rho)
    import numpy as np

    nz = {int(i): int(regs[i]) for i in np.flatnonzero(regs)}
    assert nz == {b: r for b, r in naive.items() if r > 0}


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=64),
)
def test_packing_offsets_are_exclusive_prefix_sums(token_counts, budget):
    """Per-shard pack invariants hold for any token-count sequence: offsets
    are the exclusive prefix sum and bin = offset // budget."""
    import pyarrow as pa

    from pdf_entity_extraction_ray.ops.packing import pack_sequences

    texts = [" ".join("w" for _ in range(c)) for c in token_counts]
    import ray
    import ray.data

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    out = pa.concat_tables(
        list(
            pack_sequences(docs, budget=budget, shard_size=10**9).iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    rows = sorted(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("tok_offset").to_pylist(),
            out.column("bin").to_pylist(),
        )
    )
    run = 0
    for doc_id, off, b in rows:
        assert off == run and b == off // budget
        run += token_counts[doc_id]
