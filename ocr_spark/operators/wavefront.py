"""w01: 2-D wavefront dynamic programming — iterative anti-diagonal
tile joins.

This is the Spark re-expression of the reference's flagship dataflow
example: tiled Smith-Waterman alignment, where tile (i, j) becomes
runnable once its north (i-1, j), west (i, j-1) and northwest
(i-1, j-1) neighbours have produced their boundary rows/columns
(`/root/reference/examples/smith-waterman/smithwaterman.c:83-199`;
tile-EDT dependence wiring `:316-360`).  SURVEY.md §2.3 maps the
pattern to an iterative anti-diagonal join; this module implements it
for unit-cost edit distance (Levenshtein) so a DuckDB built-in
(`levenshtein`) is the independent oracle.

Execution shape (scale story):
  - Tile tasks for ALL pairs are materialized once (narrow: substring
    slicing, no shuffle) and cached.
  - One wave per anti-diagonal d = ti + tj: every tile on the diagonal,
    across every string pair, runs in the same wave — parallelism is
    (pairs × diagonal length), which at corpus scale is millions of
    independent tasks per wave.
  - The only per-wave exchange is the boundary join (north/west outputs
    keyed by consumer tile); the northwest corner rides along inside
    the north boundary array, so a wave needs only the PREVIOUS wave's
    outputs — state is O(frontier), not O(grid).
  - Each wave output is localCheckpoint()ed (the d06/g01 pattern):
    lineage stays one wave deep, so a W-wave run has bounded plan size
    and a restart resumes from the last materialized frontier.
  - Per-tile compute is a vectorized numpy row sweep via mapInPandas
    (Arrow-batched; no per-row Python): the west-dependency recurrence
    D[i][j] = min(M[j], D[i][j-1]+1) is solved per row with the
    prefix-min identity D[i][j] = min_{k<=j}(M[k] + (j-k)) — a single
    np.minimum.accumulate, no inner scalar loop.

The boundary contract: a tile covering DP rows r0..r1 / cols c0..c1
consumes  top  = D[r0-1][c0-1..c1]  and  left = D[r0..r1][c0-1],
and emits bot  = D[r1][c0-1..c1]   and  right = D[r0-1..r1][c1];
consumers read north.bot as their top and tail(west.right) as left,
so the northwest corner D[r0-1][c0-1] is bot[0] / right[0] — no
separate corner channel (the reference threads the corner as its own
datablock; folding it into the boundary arrays removes one join).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.plans import register
from ocr_spark.sources.io import load_table

# Tile size trades per-wave barrier count against per-tile work: each
# wave is a materialized frontier (localCheckpoint), so at a fixed
# MAXLEN fewer/larger tiles cut the per-wave scheduling latency that
# dominates at bench scale (TILE 64 → 7 waves ≈ 9.4 s at sf0.1; TILE
# 128 → 3 waves ≈ 4 s, identical output).  At cluster scale pick TILE
# so a wave still carries >> cores tasks: tasks/wave = pairs × diagonal
# length, so corpus-sized inputs saturate any cluster even at 128.
TILE = 128
MAXLEN = 256  # per-string truncation => at most ceil(256/128) = 2x2 tiles
PAIR_STEP = 9  # doc_id % 9 == 0 pairs with doc_id+1 (deterministic, no LIMIT)

_TASK_SCHEMA = (
    "a_id long, b_id long, ti int, tj int, ta int, tb int, "
    "a_sub string, b_sub string, top array<int>, left array<int>"
)
_OUT_SCHEMA = "a_id long, b_id long, ti int, tj int, ta int, tb int, bot array<int>, rgt array<int>"


def _compute_tiles(batches: Iterator) -> Iterator:
    """mapInPandas kernel: one input row = one runnable tile; DP block
    solved with a vectorized numpy row sweep, only boundaries emitted."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = {k: [] for k in ("a_id", "b_id", "ti", "tj", "ta", "tb", "bot", "rgt")}
        for row in pdf.itertuples(index=False):
            a_sub, b_sub = row.a_sub, row.b_sub
            h, w = len(a_sub), len(b_sub)
            prev = np.asarray(row.top, dtype=np.int64)  # D[r0-1][c0-1..c1]
            left = np.asarray(row.left, dtype=np.int64)  # D[r0..r1][c0-1]
            bchars = np.frombuffer(b_sub.encode("utf-32-le"), dtype=np.uint32)
            offs = np.arange(w + 1, dtype=np.int64)
            rgt = np.empty(h + 1, dtype=np.int64)
            rgt[0] = prev[-1]
            for i in range(h):
                cost = (bchars != ord(a_sub[i])).astype(np.int64)
                m = np.minimum(prev[1:] + 1, prev[:-1] + cost)
                x = np.concatenate(([left[i]], m)) - offs
                np.minimum.accumulate(x, out=x)
                prev = x + offs
                rgt[i + 1] = prev[-1]
            out["a_id"].append(row.a_id)
            out["b_id"].append(row.b_id)
            out["ti"].append(row.ti)
            out["tj"].append(row.tj)
            out["ta"].append(row.ta)
            out["tb"].append(row.tb)
            out["bot"].append(prev.astype(np.int32))
            out["rgt"].append(rgt.astype(np.int32))
        yield pd.DataFrame(out)


def _pairs(docs: DataFrame, maxlen: int, step: int) -> DataFrame:
    a = docs.select(
        F.col("doc_id").alias("a_id"), F.substring("text", 1, maxlen).alias("a_str")
    ).filter(F.col("a_id") % step == 0)
    b = docs.select(
        F.col("doc_id").alias("b_id"), F.substring("text", 1, maxlen).alias("b_str")
    )
    return a.join(b, a.a_id + 1 == b.b_id).select("a_id", "b_id", "a_str", "b_str")


def wavefront_editdist(
    docs: DataFrame,
    maxlen: int = MAXLEN,
    tile: int = TILE,
    step: int = PAIR_STEP,
) -> DataFrame:
    """(a_id, b_id, dist): unit-cost edit distance between truncated doc
    texts, computed by anti-diagonal wavefront over TILE×TILE DP tiles."""
    spark = docs.sparkSession
    pairs = _pairs(docs, maxlen, step)
    max_tiles = -(-maxlen // tile)

    # empty-side pairs never enter the grid: distance is the other length
    degenerate = (
        pairs.filter((F.length("a_str") == 0) | (F.length("b_str") == 0))
        .select(
            "a_id", "b_id",
            (F.length("a_str") + F.length("b_str")).cast("int").alias("dist"),
        )
    )

    # one row per tile, built narrow (substring slicing; no shuffle)
    ti = F.explode(F.sequence(F.lit(0), F.ceil(F.length("a_str") / tile).cast("int") - 1))
    tj = F.explode(F.sequence(F.lit(0), F.ceil(F.length("b_str") / tile).cast("int") - 1))
    grid = (
        pairs.filter((F.length("a_str") > 0) & (F.length("b_str") > 0))
        .withColumn("ta", F.ceil(F.length("a_str") / tile).cast("int"))
        .withColumn("tb", F.ceil(F.length("b_str") / tile).cast("int"))
        .withColumn("ti", ti)
        .withColumn("tj", tj)
        .select(
            "a_id", "b_id", "ti", "tj", "ta", "tb",
            F.substring(F.col("a_str"), F.col("ti") * tile + 1, tile).alias("a_sub"),
            F.substring(F.col("b_str"), F.col("tj") * tile + 1, tile).alias("b_sub"),
        )
        .cache()
    )

    finals: list[DataFrame] = []
    prev: DataFrame | None = None
    for d in range(2 * max_tiles - 1):
        cur = grid.filter(F.col("ti") + F.col("tj") == d)
        # boundary defaults for grid-edge tiles: D[0][c]=c, D[r][0]=r
        cur = cur.select(
            "*",
            F.when(
                F.col("ti") == 0,
                F.sequence(
                    F.col("tj") * tile, F.col("tj") * tile + F.length("b_sub")
                ).cast("array<int>"),
            ).alias("top0"),
            F.when(
                F.col("tj") == 0,
                F.sequence(
                    F.col("ti") * tile + 1, F.col("ti") * tile + F.length("a_sub")
                ).cast("array<int>"),
            ).alias("left0"),
        )
        if prev is not None:
            north = prev.select(
                "a_id", (F.col("ti") + 1).alias("ti"), "tj", F.col("bot").alias("top_n")
            )
            west = prev.select(
                "a_id", "ti", (F.col("tj") + 1).alias("tj"),
                F.slice(F.col("rgt"), 2, F.size("rgt") - 1).alias("left_w"),
            )
            cur = (
                cur.join(north, ["a_id", "ti", "tj"], "left")
                .join(west, ["a_id", "ti", "tj"], "left")
                .select(
                    "a_id", "b_id", "ti", "tj", "ta", "tb", "a_sub", "b_sub",
                    F.coalesce("top0", "top_n").alias("top"),
                    F.coalesce("left0", "left_w").alias("left"),
                )
            )
        else:
            cur = cur.select(
                "a_id", "b_id", "ti", "tj", "ta", "tb", "a_sub", "b_sub",
                F.col("top0").alias("top"), F.col("left0").alias("left"),
            )
        out = cur.mapInPandas(_compute_tiles, _OUT_SCHEMA)
        # one materialized frontier per wave: lineage stays one wave deep
        out = out.localCheckpoint(eager=True)
        finals.append(
            out.filter((F.col("ti") == F.col("ta") - 1) & (F.col("tj") == F.col("tb") - 1))
            .select("a_id", "b_id", F.element_at("bot", -1).alias("dist"))
        )
        prev = out

    grid.unpersist()
    result = finals[0]
    for f in finals[1:]:
        result = result.unionByName(f)
    return result.unionByName(degenerate)


# The DP compares Unicode code points, but DuckDB's levenshtein counts
# UTF-8 BYTES (levenshtein('é','') = 2) — so the gated entry strips
# non-ASCII code points on BOTH sides first ([^\x00-\x7F] is the same
# one-codepoint class in Java regex and RE2), making byte == codepoint
# and the oracle exact on any corpus, not just the pure-ASCII testdata.
_ASCII_ONLY_RE = r"[^\x00-\x7F]"


def _wavefront_oracle_sql(maxlen: int = MAXLEN, step: int = PAIR_STEP) -> str:
    norm_a = f"regexp_replace(a.text, '{_ASCII_ONLY_RE}', '', 'g')"
    norm_b = f"regexp_replace(b.text, '{_ASCII_ONLY_RE}', '', 'g')"
    return f"""
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(substr({norm_a}, 1, {maxlen}),
                            substr({norm_b}, 1, {maxlen})) AS INT) AS dist
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id % {step} = 0
    """


@register("w01_wavefront_editdist", oracle=_wavefront_oracle_sql())
def w01_wavefront_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", _ASCII_ONLY_RE, "")
    )
    return wavefront_editdist(docs)
