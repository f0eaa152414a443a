"""WARC container parsing — the native on-disk format of Common-Crawl
(the corpus family named by BASELINE.json's input hint).

A WARC segment is an opaque ``binary`` column holding concatenated
records::

    WARC/1.0\r\n
    <headers: Name: value\r\n ...>\r\n
    \r\n
    <Content-Length payload bytes>\r\n\r\n

``parse_warc`` explodes segments into one row per record via
mapInPandas (Arrow-batched; a record walk is inherently sequential
WITHIN a segment but segments parallelize perfectly — the same
per-file-sequential / cross-file-parallel shape as production WARC
readers).  The walk is Content-Length-driven: payload bytes are
SKIPPED, never searched, so a payload containing the literal
``WARC/1.0`` magic cannot desynchronize the parser (the fixture
generator plants exactly that adversarial record —
ocr_spark.fixtures.warc_corpus).

At 100 TB: segments are the parallel unit (Common Crawl ships ~1 GB
WARC files); the operator is a narrow one-to-many expansion with no
shuffle — downstream routing is the extract pipeline's size-bucket
repartition.  Arrow byte-cap batching (session.py) bounds worker
memory exactly as for raw pages.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

WARC_MAGIC = b"WARC/1.0\r\n"

PARSED_DDL = (
    "seg_id long, rec_idx int, url string, warc_type string, "
    "content_length int, payload_md5 string"
)


def walk_records(raw: bytes) -> list[tuple[str, str, int, bytes]]:
    """(url, warc_type, content_length, payload) per record; raises on a
    malformed segment (truncated payload / missing magic) — corrupt
    container files must fail loudly, not yield silently-short corpora."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos : pos + len(WARC_MAGIC)] != WARC_MAGIC:
            raise ValueError(f"WARC magic missing at offset {pos}")
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        headers: dict[str, str] = {}
        for line in raw[pos + len(WARC_MAGIC) : hdr_end].split(b"\r\n"):
            name, _, value = line.partition(b":")
            headers[name.strip().decode("ascii").lower()] = value.strip().decode(
                "utf-8", "replace"
            )
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError(
                f"truncated payload at offset {body_start}: need {clen} bytes"
            )
        payload = raw[body_start : body_start + clen]
        out.append(
            (
                headers.get("warc-target-uri", ""),
                headers.get("warc-type", ""),
                clen,
                payload,
            )
        )
        pos = body_start + clen
        if raw[pos : pos + 4] == b"\r\n\r\n":
            pos += 4
    return out


def parse_warc(segments: DataFrame, seg_col: str = "warc", id_col: str = "seg_id") -> DataFrame:
    """One row per WARC record: (seg_id, rec_idx, url, warc_type,
    content_length, payload_md5)."""

    def parse_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "seg_id", "rec_idx", "url", "warc_type", "content_length", "payload_md5"
            )}
            for seg_id, raw in zip(pdf[id_col], pdf[seg_col]):
                for i, (url, wtype, clen, payload) in enumerate(walk_records(bytes(raw))):
                    rows["seg_id"].append(int(seg_id))
                    rows["rec_idx"].append(i)
                    rows["url"].append(url)
                    rows["warc_type"].append(wtype)
                    rows["content_length"].append(clen)
                    rows["payload_md5"].append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(rows)

    return segments.select(id_col, seg_col).mapInPandas(parse_batches, PARSED_DDL)
