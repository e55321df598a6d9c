"""Filesystem adapter for checkpoint plumbing (Hadoop FileSystem API).

The round-1 pipeline used driver-local ``os.path`` / ``shutil`` calls for
its checkpoint discipline, which is wrong the moment the checkpoint root
is ``hdfs://`` or ``s3a://``.  This thin wrapper routes every
metadata-sized operation (existence probes, parameters.json read/write,
stage invalidation, atomic-ish rename) through the SAME Hadoop
FileSystem Spark writes the data through, so ``file:/`` local runs and
object-store runs take one code path.  (Reference analog: the dump/load
plumbing of gsearch ``src/utils/dumpload.rs:15-62`` — always beside the
index, whatever the storage.)

Data-sized IO never goes through here — stages read/write Parquet via
Spark itself.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class CheckpointFS:
    """Tiny facade over org.apache.hadoop.fs.FileSystem for one root."""

    def __init__(self, spark: SparkSession, path_hint: str):
        sc = spark.sparkContext
        self._jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(
            path_hint).getFileSystem(hconf)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def mkdirs(self, path: str) -> bool:
        return bool(self._fs.mkdirs(self._p(path)))

    def delete(self, path: str) -> bool:
        """Recursive delete; True if something was removed."""
        return bool(self._fs.delete(self._p(path), True))

    def rename(self, src: str, dst: str) -> bool:
        """Atomic on HDFS/posix; copy-ish on object stores — callers only
        rename METADATA-STAGED directories, never live query inputs."""
        return bool(self._fs.rename(self._p(src), self._p(dst)))

    def move_children(self, src_dir: str, dst_dir: str) -> int:
        """Move every data file of ``src_dir`` into ``dst_dir`` (rename, no
        copy).  Used by append-only add to commit a staged stage delta into
        the live checkpoint: parquet part-file names embed a UUID, so
        collisions are impossible, and each move is a metadata op.
        ``_SUCCESS`` markers are skipped (the destination already has one).
        Returns the number of files moved."""
        self.mkdirs(dst_dir)
        moved = 0
        for st in self._fs.listStatus(self._p(src_dir)):
            name = st.getPath().getName()
            if name == "_SUCCESS" or name.startswith("."):
                continue
            if not self._fs.rename(st.getPath(),
                                   self._p(f"{dst_dir}/{name}")):
                raise IOError(f"rename failed: {st.getPath()} -> {dst_dir}")
            moved += 1
        return moved

    def list_children(self, path: str) -> "list[str]":
        """Immediate children (files and dirs) of a directory, as full
        path strings.  Used by the add commit to enumerate staged hive
        partition dirs (``kb=…`` / ``ib=…``)."""
        return [str(st.getPath().toString())
                for st in self._fs.listStatus(self._p(path))]

    def create_atomic(self, path: str, text: str) -> bool:
        """Create ``path`` with ``text`` ONLY if it does not already
        exist (Hadoop ``createNewFile`` — atomic on HDFS/posix; object
        stores degrade to check-then-create, the standard Hadoop
        caveat).  Returns False, touching nothing, when the file is
        already there.  This is the mutual-exclusion primitive behind
        the single-writer add lock."""
        if not bool(self._fs.createNewFile(self._p(path))):
            return False
        # we won the create: filling in the body is race-free
        self.write_text(path, text)
        return True

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return str(self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"))
        finally:
            stream.close()
