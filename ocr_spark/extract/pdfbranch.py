"""Synthetic PDF-like layout branch: connected components + baseline
clustering over a monochrome page bitmap (the FIXTURES §1.2 `%SPDF`
format).

Format (defined here; the fixture generator uses ``encode_spdf`` and the
pipeline uses ``decode_spdf`` — the decoder never reads the TRUTH
section):

  b"%SPDF1\\n"
  width  : uint16 big-endian
  height : uint16 big-endian
  bitmap : height rows x ceil(width/8) bytes, MSB-first 1bpp
  b"\\nTRUTH\\n" + ground-truth text (utf-8)   [generator-only section]

Glyphs are filled rectangles of fixed height GLYPH_H whose WIDTH encodes
the character (a public font-metric table, the synthetic analogue of an
OCR shape classifier). Within a word glyphs are separated by 1 px,
words by WORD_GAP px, columns by >= COL_GAP px, lines by LINE_PITCH px.

The decoder recovers text with real layout analysis:
  1. connected components (run-based union-find over bitmap rows),
  2. baseline clustering of component boxes into lines (y-center),
  3. column detection from the x-projection profile,
  4. reading order: columns left→right, lines top→bottom, glyphs
     left→right, word breaks on x-gaps > intra-glyph gap,
  5. glyph width → character via the font table.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"%SPDF1\n"
TRUTH_SEP = b"\nTRUTH\n"

_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
# char -> glyph width (bijective: width 2..37)
FONT_WIDTH = {c: 2 + i for i, c in enumerate(_ALPHABET)}
WIDTH_CHAR = {w: c for c, w in FONT_WIDTH.items()}

GLYPH_H = 6
GLYPH_GAP = 1
WORD_GAP = 4
COL_GAP = 24
LINE_PITCH = 10
MARGIN = 3


# --- encoder (fixture generator side) -----------------------------------------


def layout_words(columns: list[list[list[str]]]) -> tuple[np.ndarray, str]:
    """Render columns -> (bitmap, truth_text). ``columns`` is a list of
    columns, each a list of lines, each a list of words (a-z0-9 only)."""
    col_widths = []
    for col in columns:
        w = 0
        for line in col:
            lw = 0
            for wi, word in enumerate(line):
                if wi:
                    lw += WORD_GAP
                lw += sum(FONT_WIDTH[c] for c in word) + GLYPH_GAP * (len(word) - 1)
            w = max(w, lw)
        col_widths.append(w)
    height = MARGIN * 2 + LINE_PITCH * max(len(col) for col in columns)
    width = MARGIN * 2 + sum(col_widths) + COL_GAP * (len(columns) - 1)
    bm = np.zeros((height, width), dtype=bool)
    x_base = MARGIN
    lines_text: list[list[str]] = []
    for ci, col in enumerate(columns):
        for li, line in enumerate(col):
            y0 = MARGIN + li * LINE_PITCH
            x = x_base
            for wi, word in enumerate(line):
                if wi:
                    x += WORD_GAP
                for gi, c in enumerate(word):
                    if gi:
                        x += GLYPH_GAP
                    gw = FONT_WIDTH[c]
                    bm[y0 : y0 + GLYPH_H, x : x + gw] = True
                    x += gw
        x_base += col_widths[ci] + COL_GAP
    # reading order: column-major
    truth_lines = [" ".join(line) for col in columns for line in col]
    return bm, "\n".join(truth_lines)


def encode_spdf(bitmap: np.ndarray, truth: str) -> bytes:
    h, w = bitmap.shape
    packed = np.packbits(bitmap, axis=1).tobytes()
    return MAGIC + struct.pack(">HH", w, h) + packed + TRUTH_SEP + truth.encode("utf-8")


# --- decoder (pipeline side; never reads TRUTH) ---------------------------------


def _connected_components(bm: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Run-based union-find CC labeling; returns bboxes (x0, x1, y0, y1)."""
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    next_label = 0
    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label)
    boxes: dict[int, list[int]] = {}
    # all horizontal runs in ONE padded 2D diff (row-major order), not a
    # numpy round-trip per row — per-row call overhead dominated the
    # decode profile; runs align start/end pairwise within each row
    v = bm.view(np.int8)
    pad = np.zeros((v.shape[0], 1), dtype=np.int8)
    d = np.diff(np.concatenate([pad, v, pad], axis=1), axis=1)
    sy, sx = np.nonzero(d == 1)
    _ey, ex = np.nonzero(d == -1)
    sy_l, sx_l, ex_l = sy.tolist(), sx.tolist(), (ex - 1).tolist()
    prev_row = -2
    runs: list[tuple[int, int, int]] = []
    pi = 0  # two-pointer cursor into prev_runs (both row's runs are
    # emitted left-to-right, so prev runs ending left of the current
    # run's start can never overlap a later run either — the overlap
    # scan is O(runs + prev_runs) per row instead of their product)
    for y, x0, x1 in zip(sy_l, sx_l, ex_l):
        if y != prev_row:
            prev_runs = runs if y == prev_row + 1 else []
            runs = []
            prev_row = y
            pi = 0
        label = next_label
        parent[label] = label
        next_label += 1
        while pi < len(prev_runs) and prev_runs[pi][1] < x0:
            pi += 1
        j = pi
        while j < len(prev_runs) and prev_runs[j][0] <= x1:
            union(prev_runs[j][2], label)  # 4-connectivity overlap
            j += 1
        runs.append((x0, x1, label))
        boxes[label] = [x0, x1, y, y]
    merged: dict[int, list[int]] = {}
    for label, b in boxes.items():
        root = find(label)
        if root in merged:
            m = merged[root]
            m[0] = min(m[0], b[0])
            m[1] = max(m[1], b[1])
            m[2] = min(m[2], b[2])
            m[3] = max(m[3], b[3])
        else:
            merged[root] = list(b)
    return [tuple(b) for b in merged.values()]


def decode_spdf(raw: bytes) -> list[str]:
    """%SPDF bytes → list of line texts in reading order.

    Raises ValueError on a corrupt header/bitmap (the caller converts
    that into a row-level error)."""
    if not raw.startswith(MAGIC):
        raise ValueError("bad SPDF magic")
    body = raw[len(MAGIC) :]
    if len(body) < 4:
        raise ValueError("truncated SPDF header")
    w, h = struct.unpack(">HH", body[:4])
    rowbytes = (w + 7) // 8
    need = 4 + rowbytes * h
    if len(body) < need or w == 0 or h == 0:
        raise ValueError("truncated SPDF bitmap")
    bm = np.unpackbits(
        np.frombuffer(body[4:need], dtype=np.uint8).reshape(h, rowbytes), axis=1
    )[:, :w].astype(bool)

    boxes = _connected_components(bm)
    if not boxes:
        return []

    # column detection from the x-projection: merge x-intervals whose gap
    # is smaller than COL_GAP, then assign boxes to the spans.
    spans: list[list[int]] = []
    for x0, x1, _, _ in sorted(boxes):
        if spans and x0 - spans[-1][1] < COL_GAP:
            spans[-1][1] = max(spans[-1][1], x1)
        else:
            spans.append([x0, x1])

    def col_of(box) -> int:
        for i, (s0, s1) in enumerate(spans):
            if s0 <= box[0] <= s1:
                return i
        return len(spans) - 1

    lines_out: list[str] = []
    for ci in range(len(spans)):
        col_boxes = [b for b in boxes if col_of(b) == ci]
        # baseline clustering on y-center
        col_boxes.sort(key=lambda b: ((b[2] + b[3]) / 2, b[0]))
        lines: list[list[tuple[int, int, int, int]]] = []
        for b in col_boxes:
            yc = (b[2] + b[3]) / 2
            if lines and abs(yc - (lines[-1][0][2] + lines[-1][0][3]) / 2) <= GLYPH_H / 2:
                lines[-1].append(b)
            else:
                lines.append([b])
        for line in lines:
            line.sort(key=lambda b: b[0])
            words: list[str] = []
            cur: list[str] = []
            prev_x1 = None
            for x0, x1, _, _ in line:
                ch = WIDTH_CHAR.get(x1 - x0 + 1, "?")
                if prev_x1 is not None and x0 - prev_x1 - 1 > GLYPH_GAP:
                    words.append("".join(cur))
                    cur = []
                cur.append(ch)
                prev_x1 = x1
            if cur:
                words.append("".join(cur))
            lines_out.append(" ".join(words))
    return lines_out
