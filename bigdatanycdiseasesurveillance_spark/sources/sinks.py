"""Batch sinks (SURVEY §2.1 S7-S14).

The reference's sinks are driver-side loops: timestamped JSON batch
files (deduplication_consumer.py:328-360), psycopg2 bulk upsert with
ON CONFLICT (psql_db_client.py:369-417), ChromaDB add with skip-existing
(chromadb_client.py:60-162), CSV reports. Engine form: every sink is a
`df.write`, upsert is a last-writer-wins window over old ∪ new, and
skip-existing is a left-anti join — all distributed, no collect().
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "append"
) -> None:
    """S10/S13: batch parquet sink. Date-partitioning is what stands in
    for the reference's hypertable time-partitioning — date filters then
    prune whole directories (SURVEY §4 partition pruning)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def upsert_last_writer_wins(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """S11: the engine's ON CONFLICT (keys) DO UPDATE
    (psql_db_client.py:369-417). Read existing ∪ new, keep the row with
    the greatest order_col per key (ties: new side wins), rewrite.

    At scale this is Delta/Iceberg MERGE territory; over plain parquet
    the rewrite touches only the table being upserted, and the window
    shuffles once on the key. Returns the merged frame as written.
    """
    if _exists(spark, path):
        existing = spark.read.parquet(path).withColumn("__gen", F.lit(0))
        union = existing.unionByName(new_df.withColumn("__gen", F.lit(1)))
    else:
        union = new_df.withColumn("__gen", F.lit(1))
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc("__gen"))
    merged = (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__gen")
    )
    tmp = path.rstrip("/") + ".__staged"
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(path)
    _remove_dir(tmp)
    return spark.read.parquet(path)


def append_skip_existing(
    spark: SparkSession, new_df: DataFrame, path: str, id_col: str
) -> int:
    """S12: append only ids not already present (the ChromaDB loader's
    skip-existing, chromadb_client.py:77-102) — a broadcast-friendly
    left-anti join on the id column instead of a driver-side set. Returns
    the number of rows appended."""
    if _exists(spark, path):
        existing_ids = spark.read.parquet(path).select(id_col)
        fresh = new_df.join(existing_ids, id_col, "left_anti")
    else:
        fresh = new_df
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(path)
    return n


def write_object_store(
    df: DataFrame,
    url: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """S13: object-store sink (reference src/database/s3_uploader.py:35-89
    uploads JSON batch files through a driver-side boto3 loop). Engine
    form: one distributed `df.write` against any Hadoop-FS URL —
    s3a://bucket/prefix, gs://, abfss://, file:/// — executors upload
    their partitions in parallel; the driver never touches the data.

    For s3a URLs the session is switched to the magic committer: task
    commits complete multipart uploads instead of renaming (rename on S3
    is a full copy — O(data) per commit — and non-atomic, the classic
    object-store-sink failure mode). Other schemes keep their default
    committers. JSON output mirrors the reference's batch-file layout;
    parquet is the analytics-grade default."""
    if fmt not in ("parquet", "json", "csv"):
        raise ValueError(f"unsupported object-store format: {fmt}")
    if url.startswith("s3a://"):
        hconf = df.sparkSession.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.committer.name", "magic")
        hconf.set("fs.s3a.committer.magic.enabled", "true")
        # uploads buffer to disk, not heap — executor memory stays bounded
        # no matter how large a partition's output file is
        hconf.set("fs.s3a.fast.upload.buffer", "disk")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(url)


def to_kafka_frame(df: DataFrame, key_col: str) -> DataFrame:
    """S7 (batch form): project any frame to the Kafka wire schema —
    string key, to_json(struct(*)) value. `.write.format("kafka")`
    consumes exactly this shape."""
    payload = [c for c in df.columns if c != key_col]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(key_col, *payload)).alias("value"),
    )


def write_csv_report(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S14: CSV report sink (forecast/anomaly outputs)."""
    df.write.mode(mode).option("header", "true").csv(path)


def _exists(spark: SparkSession, path: str) -> bool:
    # local-fs check is enough for the harness; on a cluster this is a
    # FileSystem.exists call against the same path
    return os.path.exists(path)


def _remove_dir(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def compact_table(
    spark: SparkSession, path: str, target_files: int | None = None
) -> int:
    """Operational sink maintenance: rewrite a parquet table into
    `target_files` files (default: one per ~128 MB). Streaming/upsert
    sinks accrete small files; at cluster scale small files dominate
    task-scheduling and NameNode/listing overhead, so compaction runs on
    a schedule. Returns the file count after rewrite."""
    df = spark.read.parquet(path)
    if target_files is None:
        total_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        target_files = max(1, total_bytes // (128 * 1024 * 1024))
    tmp = path.rstrip("/") + ".__compacting"
    df.coalesce(int(target_files)).write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(path)
    _remove_dir(tmp)
    n = len(
        [
            f
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
    )
    return n


def write_gold_version(df: DataFrame, base_dir: str) -> int:
    """W5/S13: versioned gold-table write — each refresh lands in
    version=N+1 (the engine's replacement for the reference's
    pick-latest-file-by-mtime, app.py:206-210: monotonically numbered
    directories instead of filesystem timestamps). Returns the version
    written."""
    version = latest_gold_version(base_dir) + 1
    df.write.mode("overwrite").parquet(os.path.join(base_dir, f"version={version}"))
    return version


def latest_gold_version(base_dir: str) -> int:
    """Highest COMMITTED version under base_dir (0 when none). A version
    counts only if Spark's _SUCCESS marker is present — a crash mid-write
    leaves a partial version=N directory that must never be read as
    latest."""
    if not os.path.isdir(base_dir):
        return 0
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(base_dir)
        if d.startswith("version=")
        and d.split("=", 1)[1].isdigit()
        and os.path.exists(os.path.join(base_dir, d, "_SUCCESS"))
    ]
    return max(versions, default=0)


def read_latest_gold(spark: SparkSession, base_dir: str) -> DataFrame:
    """Read the newest gold version (W5's latest-row-per-group applied
    to table versions)."""
    v = latest_gold_version(base_dir)
    if v == 0:
        raise FileNotFoundError(f"no gold versions under {base_dir}")
    return spark.read.parquet(os.path.join(base_dir, f"version={v}"))


def vacuum_gold_versions(
    base_dir: str, keep: int = 2, partial_grace_sec: float = 3600.0
) -> tuple[int, int]:
    """Retention for the versioned gold sink: delete all but the newest
    `keep` COMMITTED versions, plus stale uncommitted partials (a
    crashed writer's leftovers). Returns (n_deleted, n_kept). The
    versioned layout makes time travel possible but accretes a
    directory per refresh — this is the scheduled cleanup that bounds
    it, the engine's analog of DELETE+VACUUM on a table format.

    Two safety rails (a vacuum must never destroy live data):
    - ``keep`` is clamped to >= 1 — keep=0 would delete every committed
      version including the one readers are on;
    - a partial (no _SUCCESS) is deleted only when its newest mtime is
      older than ``partial_grace_sec`` — an in-flight concurrent writer
      is indistinguishable from a crashed one by marker alone, so age is
      the tiebreaker (same rule Delta/Iceberg vacuums use for orphans).
      ``partial_grace_sec`` must exceed the longest expected write
      duration: a writer legitimately slower than the grace window looks
      crashed and is vacuumed mid-write. As a last line against the
      scan-to-delete race, _SUCCESS is re-checked immediately before
      each stale partial's removal — a commit that landed after the
      scan rescues its version.
    """
    if not os.path.isdir(base_dir):
        return (0, 0)
    keep = max(1, int(keep))
    now = time.time()
    committed = []
    stale_partial = []
    for d in os.listdir(base_dir):
        if not d.startswith("version="):
            continue
        tail = d.split("=", 1)[1]
        if not tail.isdigit():
            continue
        path = os.path.join(base_dir, d)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            committed.append(int(tail))
        else:
            try:
                newest = max(
                    (os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)),
                    default=os.path.getmtime(path),
                )
            except OSError:  # raced with its writer — definitely in flight
                continue
            if now - newest > partial_grace_sec:
                stale_partial.append(int(tail))
    committed.sort()
    doomed = committed[:-keep]
    n_deleted = 0
    for v in doomed:
        _remove_dir(os.path.join(base_dir, f"version={v}"))
        n_deleted += 1
    for v in stale_partial:
        path = os.path.join(base_dir, f"version={v}")
        # TOCTOU re-check: a slow writer may have committed between the
        # scan and this delete — a fresh _SUCCESS rescues the version
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        _remove_dir(path)
        n_deleted += 1
    return (n_deleted, len(committed) - len(doomed))
