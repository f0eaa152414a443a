"""Boilerpipe/Readability-style block classification.

Text-density + link-density scoring over the flattened block array, then
a neighbor-context smoothing pass (the windowed `lag/lead` rule expressed
in-UDF: all blocks of a document are already local to the batch, so the
smoothing needs no Spark Window/shuffle — the plan stays one wide
exchange for the whole pipeline).

Rules (deliberately simple, threshold-documented, deterministic):
  base keep   : n_words >= MIN_WORDS and link_density < MAX_LINK_DENSITY
  smoothing   : a short low-link-density block (e.g. a heading) is kept
                when an adjacent block is base-kept (Boilerpipe's
                "surrounded by content" context rule)
"""

from __future__ import annotations

from ocr_spark.extract.dom import Block

MIN_WORDS = 10
MAX_LINK_DENSITY = 0.34


def classify(blocks: list[Block]) -> list[bool]:
    """Return the keep mask, aligned with ``blocks``."""
    base = [
        (b.effective_words >= MIN_WORDS) and (b.link_density < MAX_LINK_DENSITY)
        for b in blocks
    ]
    kept = list(base)
    for i, b in enumerate(blocks):
        if base[i] or b.link_density >= MAX_LINK_DENSITY:
            continue
        prev_kept = i > 0 and base[i - 1]
        next_kept = i + 1 < len(blocks) and base[i + 1]
        if prev_kept or next_kept:
            kept[i] = True
    return kept


def kept_texts(blocks: list[Block]) -> list[str]:
    mask = classify(blocks)
    return [b.text for b, k in zip(blocks, mask) if k]
