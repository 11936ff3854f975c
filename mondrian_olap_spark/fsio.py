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
