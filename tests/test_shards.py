"""p06 shard-writer kill/resume semantics (x09's contract at shard
grain): after K of N shards commit, a resumed run writes exactly N-K,
committed markers are unchanged, a third run is a no-op, and the
on-disk shard data equals a single-shot run's bit-for-bit (same rows in
the same shards, checksums equal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.shards import (
    SHARD_TOKENS,
    read_manifest,
    shard_assign,
    write_shards,
)

K = 3


def _packed(spark, sf_dir):
    from ocr_spark.operators.bpe import bpe_token_arrays_production
    from ocr_spark.operators.chunking import (
        CHUNK_TOKENS,
        chunk_token_arrays,
        pack_chunks,
    )
    from ocr_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = bpe_token_arrays_production(docs).localCheckpoint()
    chunks = chunk_token_arrays(toks, window=CHUNK_TOKENS, stride=CHUNK_TOKENS)
    return pack_chunks(
        chunks.select("doc_id", "chunk_idx", "n_chunk_tokens")
    ).persist()


def test_shard_assignment_is_deterministic_and_budgeted(spark, sf_dir):
    packed = _packed(spark, sf_dir)
    try:
        a1 = shard_assign(packed)
        rows = a1.groupBy("pack_group", "shard_idx").agg(
            F.sum("n_chunk_tokens").alias("tok"),
            F.max(F.struct("bin_idx", "n_chunk_tokens")).alias("_"),
        )
        got = {(r.pack_group, r.shard_idx): r.tok for r in rows.collect()}
        assert got
        # fill-then-overflow: every shard except a group's last holds at
        # least the budget, and none exceeds budget + one full bin
        last = {}
        for (g, s), tok in got.items():
            last[g] = max(last.get(g, -1), s)
        from ocr_spark.operators.chunking import PACK_CAP

        for (g, s), tok in got.items():
            assert tok <= SHARD_TOKENS + PACK_CAP, ((g, s), tok)
            if s < last[g]:
                assert tok >= SHARD_TOKENS - PACK_CAP, ((g, s), tok)
        # determinism: same input -> same assignment
        a2 = {
            (r.pack_group, r.bin_idx): r.shard_idx
            for r in shard_assign(packed)
            .select("pack_group", "bin_idx", "shard_idx")
            .distinct()
            .collect()
        }
        a1m = {
            (r.pack_group, r.bin_idx): r.shard_idx
            for r in a1.select("pack_group", "bin_idx", "shard_idx")
            .distinct()
            .collect()
        }
        assert a1m == a2
    finally:
        packed.unpersist()


def test_shard_kill_resume_noop(spark, sf_dir, tmp_path_factory):
    packed = _packed(spark, sf_dir)
    try:
        out = str(tmp_path_factory.mktemp("shards_run"))
        n_shards = shard_assign(packed).select("pack_group", "shard_idx").distinct().count()
        assert n_shards > K

        s1 = write_shards(spark, packed, out, run_id="r1", max_shards=K)
        assert s1["shards_processed"] == K
        m1 = {
            (r.shard_id, r.checksum, r.n_tokens)
            for r in read_manifest(spark, out).filter(F.col("run_id") == "r1").collect()
        }
        assert len(m1) == K

        s2 = write_shards(spark, packed, out, run_id="r1")
        assert s2["shards_processed"] == n_shards - K
        man = read_manifest(spark, out).filter(F.col("run_id") == "r1")
        all_rows = {(r.shard_id, r.checksum, r.n_tokens) for r in man.collect()}
        assert len(all_rows) == n_shards
        assert m1 <= all_rows  # phase-1 markers unchanged

        s3 = write_shards(spark, packed, out, run_id="r1")
        assert s3["shards_processed"] == 0  # no-op

        # the resumed run's on-disk shards == a single-shot run's
        out2 = str(tmp_path_factory.mktemp("shards_single"))
        write_shards(spark, packed, out2, run_id="r1")
        single = {
            (r.shard_id, r.checksum, r.n_tokens, r.n_chunks, r.n_bins)
            for r in read_manifest(spark, out2).collect()
        }
        resumed = {
            (r.shard_id, r.checksum, r.n_tokens, r.n_chunks, r.n_bins)
            for r in man.collect()
        }
        assert resumed == single
    finally:
        packed.unpersist()
