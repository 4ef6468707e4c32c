"""S7: file staging — the reference's rsync/cp landing step, storage-native.

The reference shells out to ``rsync -avz server:dir out/`` / ``cp`` and
checks the file arrived (workflow/scripts/utils/general.py:151-190). On a
cluster the same step is "get the source file next to the compute", and
the Spark-native way is the Hadoop FileSystem API the session already
carries: one code path works for file://, hdfs://, s3a://, gs:// — any
store the cluster can reach — with no shell, no per-node tooling.

``stage_files`` is rsync-shaped where it matters: glob sources, skip
files whose destination already exists with the same length (idempotent
re-runs), verify the copied length, and return a staging manifest
(src/dest/bytes/action) the caller can log as lineage. Driver-side by
design — staging is O(files) control-plane work; the data plane stays
in the JVM's FileSystem streams (no Python byte shuffling).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class StagedFile:
    src: str
    dest: str
    bytes: int
    action: str  # copied | skipped

    def as_tuple(self):
        return (self.src, self.dest, self.bytes, self.action)


class StagingError(RuntimeError):
    pass


def _fs(spark: SparkSession, jpath):
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def stage_files(
    spark: SparkSession,
    src_glob: str,
    dest_dir: str,
    *,
    overwrite: bool = False,
) -> list[StagedFile]:
    """Copy every file matching ``src_glob`` into ``dest_dir`` through
    the Hadoop FileSystem API; returns the staging manifest.

    A destination that already exists with the source's exact length is
    skipped (the rsync fast path); pass ``overwrite=True`` to force.
    Every copy is length-verified — a short read raises
    :class:`StagingError` like the reference's post-copy existence check,
    but strict."""
    jvm = spark.sparkContext._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    conf = spark._jsc.hadoopConfiguration()

    src_path = Path(src_glob)
    src_fs = _fs(spark, src_path)
    matches = src_fs.globStatus(src_path)
    if matches is None or len(matches) == 0:
        raise StagingError(f"no files match {src_glob!r}")

    dest_path = Path(dest_dir)
    dest_fs = _fs(spark, dest_path)
    dest_fs.mkdirs(dest_path)

    out: list[StagedFile] = []
    for st in matches:
        if not st.isFile():
            continue
        src = st.getPath()
        size = st.getLen()
        dest = Path(dest_path, src.getName())
        if not overwrite and dest_fs.exists(dest) and (
            dest_fs.getFileStatus(dest).getLen() == size
        ):
            out.append(StagedFile(str(src), str(dest), size, "skipped"))
            continue
        ok = FileUtil.copy(src_fs, src, dest_fs, dest, False, True, conf)
        got = dest_fs.getFileStatus(dest).getLen() if dest_fs.exists(dest) else -1
        if not ok or got != size:
            raise StagingError(
                f"copy of {src} to {dest} failed (wrote {got} of {size} bytes)"
            )
        out.append(StagedFile(str(src), str(dest), size, "copied"))
    return out


def staging_manifest(spark: SparkSession, staged: list[StagedFile]) -> DataFrame:
    """The manifest as a small DataFrame (lineage sink / joins)."""
    return spark.createDataFrame(
        [s.as_tuple() for s in staged],
        "src string, dest string, bytes long, action string",
    )
