"""End-to-end training-data preparation: the full curation chain —
quality gate → source-weighted mix → sequence packing → shard write —
composed as one pipeline, with cross-stage invariants and run-to-run
determinism pinned. Each stage is oracle-checked individually; this
proves they COMPOSE."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysql2pg_spark.operators.grouped import pack_sequences
from mysql2pg_spark.plans import QUERIES
from mysql2pg_spark.sinks.shards import shard_manifest, write_training_shards
from mysql2pg_spark.tables import load_table
from tests.conftest import SF_CORRECT

CAPACITY = 1024


def _prepare(spark, out_dir: str) -> dict:
    docs = load_table(spark, SF_CORRECT, "documents")
    # 1. quality gate: keep-verdict docs only
    gate = QUERIES["t15_quality_gate"](spark, SF_CORRECT)
    kept = docs.join(gate.filter("keep").select("doc_id"), "doc_id")
    # 2. source-weighted mix: replicate/downsample per source class
    mix = QUERIES["t16_weighted_mix"](spark, SF_CORRECT).select(
        "doc_id", "copy_idx"
    )
    mixed = kept.join(mix, "doc_id").withColumn(
        # replicas get distinct ids so packing treats them as documents
        "doc_id",
        F.col("doc_id") * 10 + F.col("copy_idx"),
    )
    # 3. pack into capacity-bounded training bins
    packed = pack_sequences(mixed, capacity=CAPACITY)
    # 4. shard-write the packed corpus
    write_training_shards(
        packed, out_dir, "bin_id", num_shards=4,
        records_per_file=200, order_by=["bin_id", "seq_offset"],
    )
    stats = {
        "n_kept": kept.count(),
        "n_mixed": mixed.count(),
        "n_packed": packed.count(),
        "fill": packed.groupBy("source", "bin_id")
        .agg(F.sum("n_chars").alias("fill"))
        .agg(F.max("fill"))
        .collect()[0][0],
    }
    return stats


def test_training_pipeline_composes(spark, tmp_path):
    out = str(tmp_path / "train_shards")
    stats = _prepare(spark, out)
    # the gate dropped something and the mix up/down-sampled something
    assert 0 < stats["n_kept"] < 500
    assert stats["n_mixed"] != stats["n_kept"]
    # packing preserved every mixed row and respected capacity
    assert stats["n_packed"] == stats["n_mixed"]
    assert stats["fill"] <= CAPACITY
    # shards: bounded files, nothing lost
    man = {r.file: r.n_rows for r in shard_manifest(spark, out).collect()}
    assert sum(man.values()) == stats["n_packed"]
    assert max(man.values()) <= 200
    # within-file ordering held end-to-end
    f = sorted(glob.glob(out + "/part-*.parquet"))[0]
    t = pq.read_table(f, columns=["bin_id", "seq_offset"])
    pairs = list(zip(t.column("bin_id").to_pylist(), t.column("seq_offset").to_pylist()))
    assert pairs == sorted(pairs)


def test_training_pipeline_is_deterministic(spark, tmp_path):
    """Two full runs produce identical shard contents — the resume/audit
    property: no RNG state anywhere in the chain."""
    a = _prepare(spark, str(tmp_path / "a"))
    b = _prepare(spark, str(tmp_path / "b"))
    assert a == b

    def content(d):
        rows = set()
        for f in glob.glob(str(tmp_path / d) + "/part-*.parquet"):
            t = pq.read_table(f)
            rows.update(map(tuple, zip(*[t.column(c).to_pylist() for c in t.column_names])))
        return rows

    assert content("a") == content("b")
