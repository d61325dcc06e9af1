"""Delta-gap varint codec: decode(encode(x)) == x property tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vexor_spark.functions.codec import (
    decode_posting_list,
    encode_posting_list,
    varint_decode,
    varint_encode,
)


@given(st.integers(min_value=0, max_value=2**62))
def test_varint_roundtrip(n):
    buf = bytearray()
    varint_encode(n, buf)
    got, pos = varint_decode(bytes(buf), 0)
    assert got == n and pos == len(buf)


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**40),  # doc_id
        st.integers(min_value=1, max_value=10_000),  # tf
        st.integers(min_value=1, max_value=1_000_000),  # doc_len
    ),
    max_size=200,
).map(lambda pl: sorted({p[0]: p for p in pl}.values()))  # unique sorted doc_ids


@settings(max_examples=200)
@given(posting_lists)
def test_posting_list_roundtrip(plist):
    blob = encode_posting_list(plist)
    assert decode_posting_list(blob) == [tuple(p) for p in plist]


@settings(max_examples=100)
@given(st.lists(posting_lists, min_size=0, max_size=6))
def test_batch_numpy_decode_matches_scalar(plists):
    """decode_blocks_np over concatenated blobs == per-blob scalar decode."""
    import numpy as np

    from vexor_spark.functions.codec import decode_blocks_np

    blobs = [encode_posting_list(pl) for pl in plists]
    counts = [len(pl) for pl in plists]
    ids, tfs, dls = decode_blocks_np(blobs, counts)
    want = [tuple(p) for pl in plists for p in pl]
    got = list(zip(ids.tolist(), tfs.tolist(), dls.tolist()))
    assert got == want


def test_single_blob_numpy_decode():
    from vexor_spark.functions.codec import decode_posting_list_np

    pl = [(0, 1, 5), (7, 3, 2), (2**40, 10000, 999999)]
    ids, tfs, dls = decode_posting_list_np(encode_posting_list(pl))
    assert list(zip(ids.tolist(), tfs.tolist(), dls.tolist())) == pl


def test_compression_beats_raw():
    plist = [(i * 3, 1, 50) for i in range(10_000)]
    blob = encode_posting_list(plist)
    # raw struct would be ~20B/posting; delta+varint should be ~3B here
    assert len(blob) < 10_000 * 4


def test_dict_entries_supported():
    plist = [{"doc_id": 5, "tf": 2, "doc_len": 7}, {"doc_id": 9, "tf": 1, "doc_len": 3}]
    assert decode_posting_list(encode_posting_list(plist)) == [(5, 2, 7), (9, 1, 3)]
