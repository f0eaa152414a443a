"""Property tests for the WARC record walk (pure Python — no Spark):
any sequence of records, with ANY payload bytes (including embedded
record delimiters and magic), must round-trip exactly through
walk_records, and malformed segments must raise rather than yield a
silently short corpus."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.fixtures import _record_bytes
from ocr_spark.sources.warc import WARC_MAGIC, walk_records

TS = datetime(2025, 6, 1, tzinfo=timezone.utc)

urls = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="-._/:"
    ),
    min_size=1,
    max_size=40,
).map(lambda s: "https://example.com/" + s)

payloads = st.one_of(
    st.binary(max_size=400),
    # adversarial family: payloads embedding the record framing itself
    st.binary(max_size=80).map(
        lambda b: b + b"\r\n\r\n" + WARC_MAGIC + b"Content-Length: 7\r\n\r\n" + b
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(urls, payloads), min_size=1, max_size=8))
def test_walk_round_trips_any_payload(records):
    seg = b"".join(_record_bytes(u, TS, p) for u, p in records)
    got = walk_records(seg)
    assert [(u, len(p), p) for u, p in records] == [
        (u, c, p) for u, _t, c, p in got
    ]
    assert all(t == "response" for _u, t, _c, _p in got)


@settings(max_examples=100, deadline=None)
@given(st.tuples(urls, payloads), st.integers(min_value=1, max_value=50))
def test_truncated_segment_raises(rec, cut):
    u, p = rec
    seg = _record_bytes(u, TS, p)
    body_start = seg.index(b"\r\n\r\n") + 4
    bad = seg[: max(body_start, len(seg) - 4 - cut)]  # chop payload bytes
    if len(bad) >= body_start + len(p):
        return  # cut landed entirely in the trailer — still a valid record
    with pytest.raises(ValueError):
        walk_records(bad)


def test_garbage_prefix_raises():
    with pytest.raises(ValueError, match="magic"):
        walk_records(b"HTTP/1.1 200 OK\r\n\r\n")
