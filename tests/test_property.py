"""Property-based codec tests (hypothesis): the binary layer must hold
for ARBITRARY inputs, not just the corpus shapes the other suites use."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from wiser_spark.functions.char4 import char4_to_uint, uint_to_char4
from wiser_spark.functions.packing import (
    decode_column,
    encode_column,
    pack_frame,
    unpack_frame,
)
from wiser_spark.functions.varint import (
    varint_decode,
    varint_encode,
    varint_encode_with_lengths,
)

uint64s = st.integers(min_value=0, max_value=(1 << 64) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(uint64s, max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    blob, lens = varint_encode_with_lengths(arr)
    assert blob == varint_encode(arr)
    assert len(blob) == int(lens.sum())
    dec, used = varint_decode(blob, count=len(vals))
    assert used == len(blob)
    np.testing.assert_array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(uint64s, max_size=400))
def test_column_roundtrip_any_width_mix(vals):
    arr = np.array(vals, dtype=np.uint64)
    blob, offs = encode_column(arr)
    np.testing.assert_array_equal(decode_column(blob, len(vals)), arr)
    # skip offsets decode from every 128-aligned bag boundary
    for i, off in enumerate(offs):
        got = decode_column(blob, len(vals) - i * 128, offset=int(off))
        np.testing.assert_array_equal(got, arr[i * 128:])


@settings(max_examples=60, deadline=None)
@given(st.lists(uint64s, min_size=128, max_size=128))
def test_forced_width_64_frame_equals_packframe(vals):
    arr = np.array(vals, dtype=np.uint64)
    blob, _ = encode_column(arr, force_width=64)
    # byte-identical to the scalar reference packer at width 64 when the
    # data actually needs 64 bits; always value-identical
    if int(arr.max()) >> 63:
        assert blob == pack_frame(arr)
    vals_dec, used = unpack_frame(np.frombuffer(blob, dtype=np.uint8), 0)
    assert used == len(blob)
    np.testing.assert_array_equal(vals_dec, arr)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 31) - 1))
def test_char4_properties(v):
    c = int(uint_to_char4([v])[0])
    dec = int(char4_to_uint([c])[0])
    assert 0 <= c <= 255
    assert dec <= v                      # lossy floor
    if v >= 8:
        assert v < dec + (dec >> 3) + 1  # keeps top-4-bit precision
    else:
        assert dec == v                  # small values exact


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=127),
            max_size=60,
        ),
        max_size=20,
    )
)
def test_token_spans_match_re_finditer(texts):
    import pyarrow as pa
    import pyarrow.compute as pc

    from wiser_spark.functions.tokenize import token_spans_batch

    low = pc.utf8_lower(pa.array(texts, type=pa.string()))
    counts, starts, ends = token_spans_batch(low)
    i = 0
    for t, c in zip(texts, counts):
        spans = [(int(starts[i + j]), int(ends[i + j])) for j in range(c)]
        i += c
        want = [
            (m.start(), m.end())
            for m in re.finditer(r"[a-z0-9_]+", t.lower())
        ]
        assert spans == want, (t, spans, want)
    assert i == len(starts)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=300), min_size=1,
             max_size=700),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
)
def test_blockmax_exact_for_arbitrary_tf_shapes(tfs, k, code_seed):
    """Block-max must return EXACTLY the full decode's top-k (ids,
    bit-identical scores, tie order) for arbitrary tf distributions,
    doc lengths, and k — with the prune fallback disabled so every
    shape actually runs the bounded scan."""
    from wiser_spark.config import BM25Params
    from wiser_spark.functions.bm25 import tfnorm_cache
    from wiser_spark.operators.segments import (
        _encode_term_flat,
        _topk_blockmax_single,
        decode_segment_row,
    )

    params = BM25Params(0.9, 0.4)
    tf_arr = np.array(tfs, dtype=np.int64)
    n = len(tf_arr)
    doc_ids = np.cumsum(1 + (np.arange(n) * 7919) % 5).astype(np.int64)
    seg = _encode_term_flat(0, "t", doc_ids, tf_arr, None, None)
    cache = tfnorm_cache(avgdl=33.0, params=params)
    codes_for = lambda ids: (np.asarray(ids) * 31 + code_seed) % 256  # noqa: E731
    idf_t = 1.7
    ids, tfs_dec, _ = decode_segment_row(seg)
    tf = tfs_dec.astype(np.float64)
    scores = idf_t * ((tf * (params.k1 + 1.0))
                      / (tf + cache[codes_for(ids)]))
    order = np.lexsort((ids, -scores))[:k]
    got = _topk_blockmax_single(
        [seg], k, idf_t, cache, params.k1, codes_for, prune_fallback=False
    )
    np.testing.assert_array_equal(got[0], ids[order])
    np.testing.assert_array_equal(got[1], scores[order])
