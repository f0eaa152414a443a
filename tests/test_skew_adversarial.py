"""Skew-adversarial evidence for the corpus-frequency back-join (d07):
a gram that appears in 90% of documents concentrates the join's shuffle
rows on one reducer — the classic hot-key straggler at 100 TB.

AQE's skew-join split cannot cover this join (both sides derive from
the same gram stream; with an independent right side the split engages,
with the derived one it never does — verified while building this
test), so dupgram_stats uses deterministic heavy-hitter splitting:
freq rows with n_docs >= hot_min are broadcast and their g rows join
map-side, while the shuffled tail join has per-key multiplicity
< hot_min by construction.  This test drives the adversarial corpus
through the real operator and asserts (a) the hot path IS a broadcast
join in the executed plan, (b) every hot-gram row avoided the shuffled
join (tail join carries only cold keys), and (c) the statistics are
unchanged under the adversarial distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import dupgram_stats

HOT = "click here now"
N_DOCS = 40_000
HOT_MIN = 64


def _hot_corpus(spark):
    # 90% of docs are exactly the hot 3-gram; the rest carry one unique
    # gram each, so the tail key space is wide and perfectly cold
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit(HOT))
        .otherwise(
            F.concat(
                F.lit("w"), F.col("id").cast("string"),
                F.lit(" x"), F.col("id").cast("string"),
                F.lit(" y"), F.col("id").cast("string"),
            )
        )
        .alias("text"),
    )


def test_d07_hot_gram_rows_never_shuffle(spark):
    docs = _hot_corpus(spark)
    # disable AUTO broadcast so the only possible BroadcastHashJoin is
    # the operator's explicit F.broadcast(hot) hint — at test scale AQE
    # would otherwise broadcast the tiny tail too and mask the design
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = dupgram_stats(docs, hot_min=HOT_MIN)
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # hot path is the hinted broadcast join; the tail join shuffles
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    # per-key bound on the shuffled side: no tail gram reaches hot_min,
    # so no reducer can receive a straggler-sized key group
    from ocr_spark.functions.text import norm_tokens, shingles3

    g = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles3(norm_tokens("text")))).alias("sh")
    )
    tail_max = (
        g.groupBy("sh").count().filter(F.col("count") < HOT_MIN)
        .agg(F.max("count").alias("m")).collect()[0].m
    )
    assert tail_max < HOT_MIN
    hot_share = g.filter(F.col("sh") == HOT).count() / g.count()
    assert hot_share > 0.5, "corpus not adversarial enough"

    # statistics unchanged under the adversarial distribution
    by_doc = {r.doc_id: r for r in rows}
    assert len(by_doc) == N_DOCS
    hot_doc, cold_doc = by_doc[0], by_doc[9]
    assert hot_doc.n_grams == 1 and hot_doc.n_dup_grams == 1 and hot_doc.boilerplate
    assert cold_doc.n_dup_grams == 0 and not cold_doc.boilerplate


def test_d07_hot_and_tail_partition_freq_exactly(spark):
    """Every gram row is marked exactly once: hot/tail split partitions
    the freq table, so doc stats equal the unsplit formulation's."""
    docs = _hot_corpus(spark).limit(2000)
    split = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in
             dupgram_stats(docs, hot_min=8).collect()}
    nosplit = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in
               dupgram_stats(docs, hot_min=1 << 60).collect()}
    assert split == nosplit


# --- d02: shingle-DF cap on the exact Jaccard self-join ----------------------


def _d02_corpus(spark, n_docs=3000):
    """90% of docs share one boilerplate shingle; engineered cold
    near-dup pairs (2i, 2i+1) share a unique 4-token overlap."""
    base = spark.range(n_docs)
    pair = (F.col("id") / 2).cast("long")
    shared = F.concat(
        F.lit("alpha"), pair, F.lit(" beta"), pair, F.lit(" gamma"), pair,
        F.lit(" delta"), pair,
    )
    uniq = F.concat(F.lit(" u"), F.col("id"), F.lit("a u"), F.col("id"), F.lit("b"))
    boiler = F.lit(" click here now")
    return base.select(
        F.col("id").alias("doc_id"),
        (
            F.when(F.col("id") % 10 < 9, F.concat(shared, uniq, boiler))
            .otherwise(F.concat(shared, uniq))
        ).alias("text"),
    )


def test_d02_df_cap_bounds_hot_shingle(spark):
    """The boilerplate shingle (df=90%) must never enter the self-join
    key; the engineered cold near-dup pairs must still be found with
    exact intersection counts over the surviving shingles."""
    from ocr_spark.operators.dedup import ngram_jaccard_pairs

    docs = _d02_corpus(spark)
    out = ngram_jaccard_pairs(docs, threshold=0.10, df_cap=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    rows = out.collect()
    # the cap's anti-join is the hinted broadcast
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:3000]
    got = {(r.doc_a, r.doc_b) for r in rows}
    want = {(2 * i, 2 * i + 1) for i in range(1500)}
    assert got == want
    # intersection = the 2 shared non-boilerplate shingles of each pair
    # (4 shared tokens -> 2 shared 3-gram shingles); the hot shingle is
    # excluded from n_inter even for hot-hot pairs
    assert all(r.n_inter == 2 for r in rows)


def test_d02_cap_is_noop_below_threshold(spark):
    """On a corpus where no shingle exceeds the cap, the capped join is
    row-identical to the unrestricted verifier join."""
    from ocr_spark.operators.dedup import ngram_jaccard_pairs

    docs = _d02_corpus(spark, n_docs=40)
    key = lambda r: (r.doc_a, r.doc_b, r.n_inter, r.n_a, r.n_b, r.jaccard)  # noqa: E731
    capped = sorted(map(key, ngram_jaccard_pairs(docs, df_cap=1 << 30).collect()))
    free = sorted(map(key, ngram_jaccard_pairs(docs, df_cap=None).collect()))
    assert capped and capped == free


# --- d12: heavy-hitter split on the substring-fingerprint back-join ----------


def test_d12_hot_window_rows_never_shuffle(spark):
    """A 16-token span shared verbatim by 90% of docs is one join key;
    the freq back-join must route it through the explicit broadcast."""
    from ocr_spark.operators.dedup import DUPSPAN_WINDOW, dupspan_stats

    n_docs = 8000
    shared = " ".join(f"tok{i}" for i in range(DUPSPAN_WINDOW))
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit(f"u{j}d"), F.col("id")) for j in range(DUPSPAN_WINDOW)]
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit(shared)).otherwise(uniq).alias("text"),
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = dupspan_stats(docs, hot_min=64)
        rows = {r.doc_id: r for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert len(rows) == n_docs
    hot_doc, cold_doc = rows[0], rows[9]
    # the hot doc is exactly one fully-duplicated window
    assert hot_doc.n_windows == 1 and hot_doc.n_dup_windows == 1
    assert hot_doc.n_dup_tokens == DUPSPAN_WINDOW and hot_doc.dup_fraction == 1.0
    # cold docs are untouched by the removal mask
    assert cold_doc.n_dup_windows == 0 and cold_doc.n_dup_tokens == 0


def test_d12_split_matches_unsplit(spark):
    from ocr_spark.operators.dedup import DUPSPAN_WINDOW, dupspan_stats

    shared = " ".join(f"tok{i}" for i in range(DUPSPAN_WINDOW))
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(shared + " mid"), F.col("id"), F.lit(" " + shared)
        ).alias("text"),
    )
    key = lambda r: (r.doc_id, r.n_dup_windows, r.n_dup_tokens)  # noqa: E731
    split = sorted(map(key, dupspan_stats(docs, hot_min=4).collect()))
    nosplit = sorted(map(key, dupspan_stats(docs, hot_min=1 << 60).collect()))
    assert split and split == nosplit


# --- d13: benchmark-overlap join under a hot contaminated n-gram --------------


def test_d13_hot_contaminated_ngram_stays_broadcast(spark):
    """The worst decontamination skew: one benchmark 13-gram appears in
    90% of training docs (a leaked boilerplate prompt).  The flag join
    must still be the explicit broadcast of the benchmark set (training
    windows never shuffle), and every carrier must be flagged."""
    from ocr_spark.operators.dedup import DECONTAM_WINDOW, decontam_stats

    n_docs = 8000
    bench_mod = 40  # docs 0, 40, 80, ... are the held-out slice
    leaked = " ".join(f"b{i}" for i in range(DECONTAM_WINDOW))
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit(f"u{j}d"), F.col("id")) for j in range(DECONTAM_WINDOW)]
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % bench_mod == 0) | (F.col("id") % 10 < 9), F.lit(leaked))
        .otherwise(uniq)
        .alias("text"),
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        out = decontam_stats(docs, bench_mod=bench_mod)
        rows = {r.doc_id: r for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "BroadcastHashJoin" in plan, plan[:3000]
    # benchmark docs are excluded from the report
    assert all(d % bench_mod != 0 for d in rows)
    assert len(rows) == n_docs - n_docs // bench_mod
    carriers = [r for r in rows.values() if r.contaminated]
    # every leaked-text training doc is flagged, every unique doc is clean
    assert all(rows[d].contaminated == (d % 10 < 9) for d in rows)
    assert all(r.n_contam_windows == 1 for r in carriers)
