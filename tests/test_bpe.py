"""t13 true-BPE property tests.

Pins the operator's sequential-replace formulation (apply each merge
once, in rank order, as a replace-all over the sentinel encoding) to the
classic GPT-2 ``bpe()`` priority loop on TRAINED merge tables — the
equivalence the ``bpe.py`` module docstring argues. Merge tables are
always produced by ``train_bpe_merges`` (the equivalence only holds for
training-derived tables, where a merged symbol cannot exist before its
creating merge).

Mirrors the reference's per-feature self-checking tests
(`/root/reference/tests/non-regression-tests/`), plus the differential
oracle in test_catalog_oracle.py (t13 row) the reference never had.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.operators.bpe import (
    MERGES,
    SEED_CORPUS,
    SEP,
    WB,
    classic_bpe_encode,
    train_bpe_merges,
)
from ocr_spark.operators.textstats import BPE_PATTERN


def _encode_word(word: str) -> str:
    """Python mirror of _encode_col for a single word: every char owns
    both its separators."""
    return "".join(f"{SEP}{c}{SEP}" for c in word)


def _sequential_replace(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Python mirror of merged_encoding_col restricted to one word:
    left-to-right replace-all per merge, in rank order — exactly what
    F.replace / DuckDB replace do."""
    enc = _encode_word(word)
    for a, b in merges:
        enc = enc.replace(f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}")
    toks = [t for t in enc.split(SEP) if t]
    return toks


words = st.text(alphabet="abcde", min_size=1, max_size=12)


@given(corpus=st.lists(words, min_size=1, max_size=20), probe=words)
@settings(max_examples=200, deadline=None)
def test_sequential_replace_equals_classic_loop(corpus, probe):
    merges = train_bpe_merges([" ".join(corpus)], n_merges=24)
    for w in corpus + [probe]:
        assert _sequential_replace(w, merges) == classic_bpe_encode(w, merges), (
            w,
            merges,
        )


@given(word=st.text(alphabet="ab", min_size=1, max_size=16))
@settings(max_examples=100, deadline=None)
def test_adjacent_runs_merge_like_classic(word):
    """Runs of identical symbols are the adversarial case for replace-all
    (overlapping occurrences) — the own-delimiters encoding must make
    them disjoint."""
    merges = train_bpe_merges(["ab ab aa bb aab abb " + word], n_merges=16)
    assert _sequential_replace(word, merges) == classic_bpe_encode(word, merges)


def test_tokens_roundtrip_to_word():
    for line in SEED_CORPUS:
        for w in re.findall(BPE_PATTERN, line):
            assert "".join(classic_bpe_encode(w)) == w


def test_training_is_deterministic():
    assert train_bpe_merges(SEED_CORPUS) == MERGES
    assert len(MERGES) > 0


def test_shipped_merges_actually_merge():
    """The shipped table must compress the seed corpus (tokens < chars)
    or the operator is a no-op count."""
    w = "the"
    assert len(classic_bpe_encode(w)) < len(w)


def test_spark_expression_matches_classic(spark):
    """The JVM column expression itself (not just its Python mirror)
    reproduces the classic loop on a corpus with sentinel chars, runs of
    repeats, and multi-word docs."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.bpe import bpe_token_count_col, merged_encoding_col

    texts = [
        "the quick brown fox",
        "aaaa bbbb the the the",
        f"sentinel{SEP}chars{WB}stripped the dog",
        "tokenize the documents and pack the tokens",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = {
        r["i"]: (r["enc"], r["n"])
        for r in df.select(
            "i",
            merged_encoding_col("text").alias("enc"),
            bpe_token_count_col("text").alias("n"),
        ).collect()
    }
    for i, t in enumerate(texts):
        clean = t.replace(SEP, "").replace(WB, "")
        expect_tokens = [
            tok for w in re.findall(BPE_PATTERN, clean) for tok in classic_bpe_encode(w)
        ]
        expect_enc = WB.join(
            "".join(f"{SEP}{tok}{SEP}" for tok in classic_bpe_encode(w))
            for w in re.findall(BPE_PATTERN, clean)
        )
        assert rows[i][0] == expect_enc, (i, t)
        assert rows[i][1] == len(expect_tokens), (i, t)


def test_production_word_loop_equals_classic():
    """The broadcast-rank merge loop (_bpe_word) is the classic GPT-2
    priority loop — including on hypothesis-style adversarial runs."""
    from ocr_spark.operators.bpe import _bpe_word

    ranks = {p: i for i, p in enumerate(MERGES)}
    for line in SEED_CORPUS:
        for w in re.findall(BPE_PATTERN, line):
            assert _bpe_word(w, ranks) == classic_bpe_encode(w)
    merges = train_bpe_merges(["ab ab aa bb aab abb abab aabb"], n_merges=16)
    r2 = {p: i for i, p in enumerate(merges)}
    for w in ["ababab", "aaaa", "abba", "aabbaabb", "b", ""]:
        if w:
            assert _bpe_word(w, r2) == classic_bpe_encode(w, merges), w


def test_production_mode_matches_chained_replace(spark, sf_dir):
    """The gated production path (broadcast ranks + mapInPandas) is
    byte-identical to the chained-replace oracle-replay mode over the
    real documents table — full 5-column frame including tok_digest."""
    from ocr_spark.operators.bpe import (
        bpe_tokenize_stats,
        bpe_tokenize_stats_production,
    )
    from ocr_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    prod = {
        r.doc_id: (r.n_bpe_tokens, r.n_words, r.tokens_per_word, r.tok_digest)
        for r in bpe_tokenize_stats_production(docs).collect()
    }
    replay = {
        r.doc_id: (r.n_bpe_tokens, r.n_words, r.tokens_per_word, r.tok_digest)
        for r in bpe_tokenize_stats(docs).collect()
    }
    assert prod == replay
    assert len(prod) > 0


def test_production_token_arrays_match_expression(spark):
    """bpe_token_arrays_production == the JVM bpe_token_array_col on a
    corpus with sentinels, empties, and repeats."""
    from ocr_spark.operators.bpe import (
        bpe_token_array_col,
        bpe_token_arrays_production,
    )

    texts = [
        "the quick brown fox",
        "aaaa bbbb the the the",
        f"sentinel{SEP}chars{WB}stripped the dog",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.ts for r in bpe_token_arrays_production(df).collect()}
    want = {
        r.doc_id: r.ts
        for r in df.select("doc_id", bpe_token_array_col("text").alias("ts")).collect()
    }
    assert got == want


def test_production_scales_past_demo_vocab(spark):
    """At >=1k merges — where the chained-replace expression tree is
    infeasible (analyzer depth/cost grows with vocabulary) — the
    production path still runs and matches the classic loop."""
    from ocr_spark.operators.bpe import bpe_tokenize_stats_production

    corpus = [" ".join(ln.split()) for ln in SEED_CORPUS if ln.strip()]
    big = train_bpe_merges(corpus * 4 + ["tokenization pipelines everywhere"], n_merges=1024)
    assert len(big) >= 300, len(big)  # seed vocab exhausts eventually; still way past demo
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.n_bpe_tokens for r in bpe_tokenize_stats_production(df, merges=big).collect()}
    for i, t in enumerate(corpus):
        want = sum(len(classic_bpe_encode(w, big)) for w in re.findall(BPE_PATTERN, t))
        assert rows[i] == want, (i, t)


# --- t18: distributed BPE merge training ------------------------------------


def test_distributed_train_matches_classic_on_seed_corpus(spark):
    """The distributed trainer learns the SAME merge list (same ranks,
    same tie-breaks) as the pure-Python classic trainer."""
    from ocr_spark.operators.bpe import distributed_bpe_train

    texts = [ln for ln in SEED_CORPUS if ln.strip()]
    want = train_bpe_merges(texts, n_merges=40)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.lhs, r.rhs)
        for r in distributed_bpe_train(df, 40, word_partitions=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_distributed_train_tie_breaks_and_overlaps(spark):
    """Adversarial corpus: overlapping self-pairs (aaaa -> (a,a) counted
    3x, merged non-overlapping left-to-right) and exact count ties that
    only the lexicographic (a, b) tie-break resolves."""
    from ocr_spark.operators.bpe import distributed_bpe_train

    texts = ["aaaa bbbb aaaa bbbb", "zz yy zz yy xx", "cdcd dcdc cddc"]
    want = train_bpe_merges(texts, n_merges=12)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.lhs, r.rhs)
        for r in distributed_bpe_train(df, 12, word_partitions=1)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_distributed_train_unicode_parity(spark):
    """Non-ASCII corpora: Spark's UTF8_BINARY tie-break order must equal
    Python's code-point tuple order (UTF-8 byte order is code-point
    order), and the (.) char split must agree with Python's tuple()."""
    from ocr_spark.operators.bpe import distributed_bpe_train

    texts = ["日本語の文章 日本語の文章 正確で速い", "中文网页正文 中文网页", "éèêë éèê ü"]
    want = train_bpe_merges(texts, n_merges=16)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.lhs, r.rhs)
        for r in distributed_bpe_train(df, 16, word_partitions=1)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_trained_merges_feed_the_encoder(spark):
    """Lifecycle closure: merges learned by the distributed trainer
    drive the production encoder to the same tokens as the classic
    priority loop under the same table."""
    from ocr_spark.operators.bpe import (
        bpe_tokenize_stats_production,
        distributed_bpe_train,
    )

    texts = [ln for ln in SEED_CORPUS if ln.strip()]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    learned = [
        (r.lhs, r.rhs)
        for r in distributed_bpe_train(df, 24, word_partitions=2)
        .orderBy("rank")
        .collect()
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_tokenize_stats_production(docs, merges=learned).collect()
    }
    for i, t in enumerate(texts):
        want = sum(
            len(classic_bpe_encode(w, learned)) for w in re.findall(BPE_PATTERN, t)
        )
        assert rows[i] == want, (i, t)
