"""Atomic snapshot publishing for batch outputs — the manifest-commit
protocol (the core idea of Iceberg/Delta-style table formats, reduced to
its minimal useful form; public method). A plain ``df.write.parquet``
is NOT atomic to readers: a concurrent reader can list a half-written
directory. Here every write lands in an immutable snapshot directory
and becomes visible only when a tiny manifest pointer is swapped:

    base/
      data/snap=<id>/part-*.parquet    (immutable once published)
      snapshots/<id>.json              (per-snapshot manifest: file list)
      _MANIFEST.json                   (pointer to the current snapshot)

Readers resolve ``_MANIFEST.json`` → snapshot manifest → explicit file
list, so they never depend on directory listing and never observe a
partial write. Old snapshots remain readable by id (time travel) until
``expire_snapshots`` removes them.

All filesystem ops go through the Hadoop FileSystem API (works on
file://, hdfs://, gs://, s3a:// alike). Atomicity note: the pointer
swap is write-tmp → delete-old → rename; on HDFS/local rename is atomic
and the unprotected window is a metadata op between two manifests that
both describe COMPLETE snapshots — a reader racing the swap sees the
old or (transiently) no pointer, never partial data. On object stores
without atomic rename, pair with a conditional-put or a locking service
for multi-writer setups (single-writer pipelines — the normal batch
case — are safe as-is).

Scale: manifests hold file NAMES, not row data — O(files) bytes. The
data write is a normal parquet job (partition-parallel); publish adds
two metadata writes regardless of data size.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm


def _write_file(spark: SparkSession, path: str, payload: bytes) -> None:
    fs, jvm = _fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()


def _read_file(spark: SparkSession, path: str) -> bytes:
    # py4j passes byte[] BY VALUE — Java-side readFully mutations never
    # reach a Python bytearray, but a byte[] RETURN converts fine: drain
    # through hadoop-common's IOUtils into a ByteArrayOutputStream and
    # return toByteArray(). hadoop-common ships the FileSystem API being
    # called, so unlike commons-io it cannot be absent or shaded away.
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    baos = jvm.java.io.ByteArrayOutputStream()
    # copyBytes(in, out, buffSize, close=True) closes both streams
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 8192, True)
    return bytes(baos.toByteArray())


def _exists(spark: SparkSession, path: str) -> bool:
    fs, jvm = _fs(spark, path)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(path))


def current_snapshot_id(spark: SparkSession, base_dir: str) -> int | None:
    """Snapshot id the pointer currently names, or None if never
    published."""
    pointer = f"{base_dir}/_MANIFEST.json"
    if not _exists(spark, pointer):
        return None
    return int(json.loads(_read_file(spark, pointer))["snapshot"])


def publish_snapshot(
    df: DataFrame,
    base_dir: str,
    snapshot_id: int | None = None,
    pointer_swap=None,
) -> dict:
    """Write ``df`` as the next snapshot of ``base_dir`` and atomically
    make it current. Returns the manifest dict. ``snapshot_id`` defaults
    to current + 1 (1 for a fresh table); passing an existing id raises
    (snapshots are immutable).

    ``pointer_swap``: optional ``(spark, pointer_path, payload_bytes,
    expected_current_id) -> None`` hook replacing the default
    delete-old + rename commit — the seam for object-store multi-writer
    safety (S3/GCS conditional PUT with if-match/x-goog-if-generation,
    or a DynamoDB/ZooKeeper lock, as Iceberg's commit services do). The
    default path additionally re-reads the pointer just before the swap
    and raises on a concurrent advance (optimistic concurrency: detects
    lost-update races even where rename alone could silently clobber)."""
    spark = df.sparkSession
    cur = current_snapshot_id(spark, base_dir)
    snap = int(snapshot_id) if snapshot_id is not None else (cur or 0) + 1
    data_path = f"{base_dir}/data/snap={snap}"
    if _exists(spark, data_path):
        raise ValueError(f"snapshot {snap} already exists (immutable)")
    df.write.parquet(data_path)
    fs, jvm = _fs(spark, data_path)
    statuses = fs.listStatus(jvm.org.apache.hadoop.fs.Path(data_path))
    files = sorted(
        s.getPath().getName()
        for s in statuses
        if s.getPath().getName().endswith(".parquet")
    )
    manifest = {
        "snapshot": snap,
        "data_path": data_path,
        "files": files,
        "n_files": len(files),
        "schema": df.schema.jsonValue(),
    }
    payload = json.dumps(manifest, sort_keys=True).encode()
    final = f"{base_dir}/_MANIFEST.json"
    # optimistic re-check BEFORE the snapshot manifest lands: a conflict
    # detected after snapshots/{snap}.json exists would leave a
    # fully-formed orphan that time-travel readers treat as published
    # and whose id is burned forever — on conflict, the uncommitted data
    # directory is removed so the id stays reusable
    if pointer_swap is None and current_snapshot_id(spark, base_dir) != cur:
        fs.delete(jvm.org.apache.hadoop.fs.Path(data_path), True)
        raise RuntimeError(
            f"concurrent publish detected on {base_dir}: pointer advanced "
            f"past snapshot {cur} during this write; retry from "
            "current_snapshot_id (or supply pointer_swap for a "
            "conditional-put commit on object stores)"
        )
    _write_file(spark, f"{base_dir}/snapshots/{snap}.json", payload)
    if pointer_swap is not None:
        try:
            pointer_swap(spark, final, payload, cur)
        except Exception:
            # a failed conditional PUT (commit conflict) must not leave a
            # fully-formed orphan: snapshots/{snap}.json was written just
            # above and time-travel readers would treat it as published,
            # burning the id — mirror the default path's conflict cleanup
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base_dir}/snapshots/{snap}.json"), False)
            fs.delete(jvm.org.apache.hadoop.fs.Path(data_path), True)
            raise
        return manifest
    # default pointer swap: tmp write, then delete-old + rename (atomic
    # on HDFS/local; see module docstring for object-store caveats)
    tmp = f"{base_dir}/_MANIFEST.json.tmp"
    _write_file(spark, tmp, payload)
    fs2, jvm2 = _fs(spark, final)
    fp = jvm2.org.apache.hadoop.fs.Path(final)
    if fs2.exists(fp):
        fs2.delete(fp, False)
    if not fs2.rename(jvm2.org.apache.hadoop.fs.Path(tmp), fp):
        raise IOError(f"manifest pointer swap failed for {base_dir}")
    return manifest


def read_snapshot(
    spark: SparkSession, base_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the current snapshot (or a specific ``snapshot_id`` — time
    travel) via its manifest's explicit file list; never by directory
    listing, so concurrent writes are invisible."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(spark, base_dir)
        if snapshot_id is None:
            raise FileNotFoundError(f"no published snapshot in {base_dir}")
    manifest = json.loads(
        _read_file(spark, f"{base_dir}/snapshots/{int(snapshot_id)}.json")
    )
    paths = [f"{manifest['data_path']}/{f}" for f in manifest["files"]]
    return spark.read.parquet(*paths)


def expire_snapshots(spark: SparkSession, base_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` snapshots (data + manifest);
    the current pointer's snapshot is always kept. Returns the ids
    removed."""
    fs, jvm = _fs(spark, f"{base_dir}/snapshots")
    sdir = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/snapshots")
    if not fs.exists(sdir):
        return []
    ids = sorted(
        int(s.getPath().getName().removesuffix(".json"))
        for s in fs.listStatus(sdir)
        if s.getPath().getName().endswith(".json")
    )
    cur = current_snapshot_id(spark, base_dir)
    doomed = [i for i in ids[:-keep] if i != cur] if keep > 0 else []
    for i in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base_dir}/data/snap={i}"), True)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base_dir}/snapshots/{i}.json"), False)
    return doomed
