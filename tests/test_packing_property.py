"""Property-based checks of the greedy sequence packer's invariants and the
TIFF codec roundtrip — random inputs, pure-python replicas of the engine
logic (the cross-engine parity of the Spark/DuckDB forms is pinned by
tests/test_oracle_parity.py; these pin the SEMANTICS)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def greedy_pack(toks: list[int], budget: int = 512) -> list[int]:
    """Reference replica of the engine's per-shard walk."""
    bins, fill, b = [], 0, 0
    for t in toks:
        if fill and fill + t > budget:
            b, fill = b + 1, 0
        fill += t
        bins.append(b)
    return bins


@given(st.lists(st.integers(min_value=1, max_value=700), max_size=200))
@settings(max_examples=200, deadline=None)
def test_greedy_pack_invariants(toks):
    bins = greedy_pack(toks)
    assert len(bins) == len(toks)
    if not toks:
        return
    # bin ids start at 0 and increase by at most 1 (no empty bins)
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # every bin's fill is <= budget unless it holds a single oversized doc
    fills: dict[int, list[int]] = {}
    for t, b in zip(toks, bins):
        fills.setdefault(b, []).append(t)
    for members in fills.values():
        assert sum(members) <= 512 or len(members) == 1
    # greedy tightness: a doc never fits in the previous bin
    for i in range(1, len(toks)):
        if bins[i] != bins[i - 1]:
            prev_fill = sum(fills[bins[i - 1]])
            assert prev_fill + toks[i] > 512


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.randoms(use_true_random=False),
)
@settings(max_examples=50, deadline=None)
def test_tiff_roundtrip_property(w, h, rnd):
    from dask_image_spark.operators.multimodal import decode_tiff, encode_tiff

    px = [rnd.randrange(256) for _ in range(w * h)]
    assert decode_tiff(encode_tiff(px, w, h)) == (w, h, px)


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.randoms(use_true_random=False),
)
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_property(w, h, rnd):
    from dask_image_spark.operators.multimodal import decode_png, encode_png

    px = [rnd.randrange(256) for _ in range(w * h)]
    assert decode_png(encode_png(px, w, h)) == (w, h, px)
