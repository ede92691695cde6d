"""Storage-agnostic filesystem helpers over the Hadoop FileSystem API.

Driver-side state management (versioned DSIR state dirs, compaction
staging paths) previously used ``os.listdir``/``shutil`` — correct on
``file://`` but broken the moment a deployment points the state path at
HDFS or S3A.  These helpers resolve the FileSystem FOR the given path
(``Path.getFileSystem`` — scheme-dispatch, so ``file://``, ``hdfs://``
and ``s3a://`` all work) and expose the handful of operations the
engine needs.  All calls are driver-side metadata operations on
model-sized state (≤ a few directories), never data-path I/O.

Reference analog: the reference's run-state persistence
(``reference/src/agents/orchestrator.py:85-166`` keeps retry/validation
state across steps); here the same durability contract must hold on
cloud storage.
"""

from __future__ import annotations


def _fs_and_path(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


def list_dir(spark, path: str) -> list[str]:
    """Child NAMES (not full paths) of ``path``; [] if it doesn't exist."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [s.getPath().getName() for s in fs.listStatus(jpath)]


def exists(spark, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def delete(spark, path: str) -> bool:
    """Recursive delete; False if the path didn't exist."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.delete(jpath, True))


def touch(spark, path: str) -> None:
    """Create (or truncate) a zero-byte marker file — the commit-marker
    primitive for staged swaps: written LAST after a stage's data is
    fully on disk, so a heal can distinguish committed-by-marker from
    crashed-mid-write (mere existence of staged data is NOT commitment;
    r12 ADVICE on the BM25 compaction heal)."""
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    out.close()


def rename(spark, src: str, dst: str) -> bool:
    """Hadoop FS rename (atomic per-directory on HDFS and local file://;
    the swap step of every staged-generation lifecycle).  False if the
    source doesn't exist or the destination blocks the move."""
    fs, jsrc = _fs_and_path(spark, src)
    jdst = _fs_and_path(spark, dst)[1]
    if not fs.exists(jsrc):
        return False
    return bool(fs.rename(jsrc, jdst))
