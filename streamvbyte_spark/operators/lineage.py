"""Checkpoint-resume via a per-partition lineage table (the commit log).

The encode job writes encoded blocks bucketed by ``pmod(hash(doc_id), B)``
and, per completed bucket, one lineage row (docs, in/out bytes, checksum sum,
run id).  A rerun left-anti-joins the work table against completed buckets
and only encodes what is missing — the north rule's "resumable from
checkpoint with per-partition lineage + metrics".

At 10^12 rows the lineage table is tiny (one row per bucket), so the resume
join is a broadcast join against the full input scan; the bucket column also
gives Iceberg/parquet partition pruning on the encoded output.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .encode import encode_table


def _bucketed(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.hash("doc_id"), F.lit(n_buckets)))


def completed_buckets(spark: SparkSession, out_path: str) -> DataFrame:
    """Buckets already committed by a previous (possibly failed) run."""
    lineage_path = os.path.join(out_path, "_lineage")
    try:
        return spark.read.parquet(lineage_path).select("bucket").distinct()
    except Exception:
        return spark.createDataFrame([], "bucket int")


def encode_with_checkpoint(tok_df: DataFrame, out_path: str,
                           n_buckets: int = 64, codec: str = "auto",
                           fail_after_buckets: int | None = None) -> dict:
    """Encode tok_df to out_path/data (parquet, partitioned by bucket) with a
    lineage commit log; skips buckets a prior run already committed.

    fail_after_buckets: test hook — process only that many pending buckets
    (simulates a mid-job failure after some buckets committed).
    """
    spark = tok_df.sparkSession
    done = completed_buckets(spark, out_path)
    work = _bucketed(tok_df, n_buckets).join(
        F.broadcast(done), "bucket", "left_anti")

    pending = [r.bucket for r in work.select("bucket").distinct().collect()]
    pending.sort()
    if fail_after_buckets is not None:
        pending = pending[:fail_after_buckets]
        work = work.where(F.col("bucket").isin(pending))
    if not pending:
        return {"encoded_buckets": 0, "skipped": True}

    run_id = uuid.uuid4().hex[:12]
    enc = encode_table(work.drop("bucket"), codec=codec)
    enc = enc.withColumn("bucket", F.pmod(F.hash("doc_id"), F.lit(n_buckets)))
    # idempotent per bucket: dynamic partition overwrite replaces exactly the
    # bucket partitions this run produces, so a rerun after a crash in the
    # data-write/lineage-commit gap REPLACES the uncommitted buckets instead
    # of appending duplicate rows (exactly-once resume)
    (enc.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket")
     .parquet(os.path.join(out_path, "data")))

    # commit: lineage rows are written only after the data write succeeded
    lineage = (spark.read.parquet(os.path.join(out_path, "data"))
               .where(F.col("bucket").isin(pending))
               .groupBy("bucket")
               .agg(F.count("*").alias("docs"),
                    F.sum("in_bytes").alias("in_bytes"),
                    F.sum("out_bytes").alias("out_bytes"),
                    F.sum("checksum").alias("checksum_sum"))
               .withColumn("run_id", F.lit(run_id)))
    lineage.write.mode("append").parquet(os.path.join(out_path, "_lineage"))
    return {"encoded_buckets": len(pending), "run_id": run_id}


def read_encoded(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "data"))


def lineage_metrics(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "_lineage"))


def compact_encoded(spark: SparkSession, out_path: str,
                    files_per_bucket: int = 1) -> dict:
    """Small-file compaction of the encoded table (the Iceberg rewrite-
    data-files maintenance analog): every append/resume cycle leaves one
    file set per run per bucket; at 10^12 rows the read amplification of
    thousands of small files per bucket dominates scan cost.  Rewrites each
    bucket's rows into files_per_bucket files via dynamic partition
    overwrite — the same idempotent commit the resume path uses, so a crash
    mid-compaction leaves every bucket either old or new, never mixed.
    Byte payloads are untouched (verified by test byte-identity)."""
    data_path = os.path.join(out_path, "data")
    raw = spark.read.parquet(data_path)
    before = len(raw.inputFiles())
    n_buckets = raw.select("bucket").distinct().count()
    if n_buckets == 0:
        return {"files_before": before, "files_after": before}
    files_per_bucket = max(files_per_bucket, 1)
    # partition on (bucket, salt): repartitioning on bucket alone can never
    # SPLIT a bucket across tasks, so files_per_bucket > 1 would silently
    # still write one file per bucket; the salt carves each bucket into
    # files_per_bucket slices.  localCheckpoint materializes the shuffled
    # rows BEFORE the write so overwriting the path being read is safe (the
    # write no longer depends on the source files).
    salt = F.pmod(F.hash("doc_id"), F.lit(files_per_bucket))
    enc = (raw.withColumn("_slice", salt)
           .repartition(files_per_bucket * n_buckets, "bucket", "_slice")
           .drop("_slice")
           .sortWithinPartitions("doc_id")
           .localCheckpoint())
    (enc.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket")
     .parquet(data_path))
    after = len(spark.read.parquet(data_path).inputFiles())
    return {"files_before": before, "files_after": after}
