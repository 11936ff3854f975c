"""Small text-file I/O over the Hadoop FileSystem API — so sidecar
artifacts (the aggregate manifest, and anything else engine code keeps
NEXT TO parquet data) live on whatever store the data lives on: local
paths in tests, HDFS/object stores in production.  Plain ``open()`` would
silently pin those artifacts to the driver's local disk the moment a
``path_prefix`` points at a real cluster store.

Only driver-side, tiny-payload use (a manifest is a few KB); bulk data
always goes through DataFrame readers/writers.
"""

from __future__ import annotations


def _fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def exists(spark, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def read_text(spark, path: str) -> str:
    """Read a whole (small) text file from any supported filesystem.
    Line-oriented via BufferedReader — py4j cannot fill a Java byte[] in
    place, and these artifacts are line-structured JSON anyway."""
    jvm = spark._jvm
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            ln = reader.readLine()
            if ln is None:
                break
            lines.append(ln)
        return "\n".join(lines)
    finally:
        stream.close()


def write_text(spark, path: str, text: str) -> None:
    """Write a whole (small) text file, overwriting; parent directories
    are created as needed (Hadoop create() semantics)."""
    fs, p = _fs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def atomic_overwrite_dir(spark, path: str, write_fn) -> None:
    """Crash-safe overwrite of a directory artifact: ``write_fn(target)``
    writes a COMPLETE copy to ``<path>.__tmp__``, which is then swapped
    in with two renames.  A failure at any point leaves a complete copy
    on disk — before the swap the old artifact is untouched; between the
    renames it survives at ``<path>.__old__`` (restore by renaming
    back).  Stale ``__tmp__`` / ``__old__`` directories from an earlier
    crash are cleaned up first.  When ``path`` does not exist yet,
    ``write_fn`` writes it directly (nothing to protect).

    This is the shared swap behind every persisted-artifact overwrite
    (Bloom bitmaps, histograms, …); the renames go through the Hadoop
    FileSystem API, so it works on any supported store.
    """
    fs, dest = _fs(spark, path)
    base = path.rstrip("/")
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    tmp, old = HPath(base + ".__tmp__"), HPath(base + ".__old__")
    # crash between the two renames leaves dest missing with the last
    # good copy in .__old__ — finish the interrupted swap by restoring it
    # (the rebuild then runs through the protected path below, so a crash
    # mid-rebuild still leaves a complete copy on disk)
    if not fs.exists(dest) and fs.exists(old):
        fs.rename(old, dest)
    # stale cleanup runs BEFORE the dest-missing fast path so orphan
    # .__tmp__/.__old__ directories from an earlier crash never persist
    for stale in (tmp, old):
        if fs.exists(stale):
            fs.delete(stale, True)
    if not fs.exists(dest):
        write_fn(path)
        return
    write_fn(base + ".__tmp__")
    if not fs.rename(dest, old):
        raise IOError(f"atomic_overwrite_dir: could not move aside {path}")
    if not fs.rename(tmp, dest):
        # restore the old artifact so the store is never left empty
        fs.rename(old, dest)
        raise IOError(
            f"atomic_overwrite_dir: could not swap in new artifact at {path}"
        )
    fs.delete(old, True)
    # the swap changes file names under an unchanged directory path —
    # drop Spark's cached file listing or the next read of this path
    # fails with FAILED_READ_FILE.FILE_NOT_EXIST
    spark.catalog.refreshByPath(path)


def tiny_df(spark, rows, schema):
    """Single-partition DataFrame from a handful of driver-side rows —
    for params-sized artifact sidecars (``_params``, ``_centroids``, …).

    ``spark.createDataFrame(rows)`` parallelizes the list over
    ``defaultParallelism`` PYTHON-RDD slices (the plan is
    ``Scan ExistingRDD`` via ``applySchemaToPythonRDD``), and the
    ``coalesce(1)`` these sidecar writes want then computes all of those
    slices SEQUENTIALLY inside one task, each paying its own
    Python-worker round-trip — measured ~5-6 s for a ONE-ROW parquet
    write on ``local[32]`` vs ~0.3 s with a single slice.  Parallelizing
    with one slice up front keeps the single output file and crosses the
    Python boundary once."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
