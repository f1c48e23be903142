"""FileIO — pluggable storage for LakeTable metadata and staged files.

The reference reaches object stores through PyIceberg's FileIO plus DuckDB
S3 secrets (reference: src/dlt_iceberg/sql_client.py:70-99,
destination_client.py S3FileIO configuration).  No PyIceberg/fsspec exists
in this environment, but Spark's JVM already carries the Hadoop FileSystem
API — the same connector layer (s3a://, gs://, abfs://, hdfs://) every
Spark cluster uses for its own reads — so :class:`HadoopFileIO` routes the
table-format's metadata I/O through py4j to whatever filesystem the cluster
is configured for, with ZERO new dependencies.  Data-file and manifest
payload I/O stays scheme-agnostic anyway (Spark jobs read/write them by
URI); this layer covers the driver-side metadata surface: version pointers,
snapshot JSON, manifest bytes, staging-file moves.

Atomicity note (the honest part): the commit protocol's pointer swap relies
on atomic rename.  That holds on POSIX filesystems and HDFS; S3A rename is
copy+delete (NOT atomic) — real Iceberg solves this by moving the pointer
swap into a catalog (REST/Glue/JDBC), which is exactly what
``lake/iceberg_config.py`` configures when one exists.  HadoopFileIO
therefore documents rename semantics per backend instead of pretending;
for object stores the supported deployment is catalog-owned pointers.
"""

from __future__ import annotations

import io as _io
import os
import shutil
from typing import Iterable
from urllib.parse import urlparse


def scheme_of(location: str) -> str:
    """URI scheme of ``location`` ('' for plain paths)."""
    p = urlparse(location)
    # windows drive letters parse as 1-char schemes; this repo is POSIX-only
    return p.scheme if len(p.scheme) > 1 else ""


class LocalFileIO:
    """POSIX-backed FileIO (the default).  Accepts plain paths and
    ``file://`` URIs; rename is atomic."""

    atomic_rename = True

    @staticmethod
    def _p(path: str) -> str:
        if path.startswith("file://"):
            return urlparse(path).path
        return path

    def read_text(self, path: str) -> str:
        with open(self._p(path)) as fh:
            return fh.read()

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as fh:
            return fh.read()

    def write_text(self, path: str, data: str) -> None:
        with open(self._p(path), "w") as fh:
            fh.write(data)

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(self._p(path), "wb") as fh:
            fh.write(data)

    def write_text_exclusive(self, path: str, data: str) -> None:
        """Create-or-fail (O_EXCL): raises FileExistsError if present."""
        with open(self._p(path), "x") as fh:
            fh.write(data)

    def rename(self, src: str, dst: str) -> None:
        os.rename(self._p(src), self._p(dst))

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def listdir(self, path: str) -> list[str]:
        return os.listdir(self._p(path))

    def remove(self, path: str) -> None:
        os.remove(self._p(path))

    def rmtree(self, path: str) -> None:
        shutil.rmtree(self._p(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def size(self, path: str) -> int:
        return os.path.getsize(self._p(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def walk_files(self, root: str) -> Iterable[str]:
        """Every file under ``root``, as paths RELATIVE to it."""
        rp = self._p(root)
        for cur, _dirs, names in os.walk(rp):
            rel_dir = os.path.relpath(cur, rp)
            for name in sorted(names):
                yield name if rel_dir == "." else os.path.join(rel_dir, name)

    def open_parquet_source(self, path: str):
        """A pyarrow-compatible source for footer reads: local paths are
        handed to pyarrow directly (seekable, zero-copy)."""
        return self._p(path)


class HadoopFileIO:
    """FileIO over the JVM Hadoop FileSystem of the active SparkSession.

    Supports every scheme the cluster's Hadoop configuration does (s3a://,
    gs://, abfs://, hdfs://, file://) — driver-side metadata I/O rides py4j;
    bulk data stays in Spark jobs.  ``atomic_rename`` reports whether the
    resolved filesystem renames atomically (HDFS/local yes; S3A no — see
    module docstring for the catalog-owned-pointer deployment).
    """

    #: schemes whose Hadoop FileSystem rename is NOT atomic — commit-pointer
    #: safety on these requires a catalog (iceberg_config.py)
    _NON_ATOMIC_SCHEMES = {"s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss"}

    def __init__(self, spark, base_uri: str):
        self._sc = spark.sparkContext
        self._base_uri = base_uri
        self.atomic_rename = scheme_of(base_uri) not in self._NON_ATOMIC_SCHEMES
        self._fs_cache = None
        self._fc_cache = None

    # -- helpers -----------------------------------------------------------

    @property
    def _jvm(self):
        return self._sc._jvm

    @property
    def _jPath(self):
        return self._jvm.org.apache.hadoop.fs.Path

    @property
    def _fs(self):
        # lazy: resolving a FileSystem may open connections / need connector
        # jars — a config-only HadoopFileIO (e.g. atomicity inspection) must
        # not pay or fail that
        if self._fs_cache is None:
            self._fs_cache = self._jPath(self._base_uri).getFileSystem(
                self._sc._jsc.hadoopConfiguration()
            )
        return self._fs_cache

    def _path(self, path: str):
        return self._jPath(path)

    @staticmethod
    def _is_not_found(err) -> bool:
        java_exc = getattr(err, "java_exception", None)
        return java_exc is not None and "FileNotFoundException" in java_exc.getClass().getName()

    # -- protocol ----------------------------------------------------------

    def read_bytes(self, path: str) -> bytes:
        from py4j.protocol import Py4JJavaError

        try:
            stream = self._fs.open(self._path(path))
        except Py4JJavaError as err:
            if self._is_not_found(err):
                raise FileNotFoundError(path) from None
            raise
        try:
            # commons-io ships on every Spark classpath
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data)

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._path(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def write_text(self, path: str, data: str) -> None:
        self.write_bytes(path, data.encode("utf-8"))

    def write_text_exclusive(self, path: str, data: str) -> None:
        from py4j.protocol import Py4JJavaError

        try:
            out = self._fs.create(self._path(path), False)
        except Py4JJavaError as err:
            java_exc = getattr(err, "java_exception", None)
            if java_exc is not None and "ExistsException" in java_exc.getClass().getName():
                raise FileExistsError(path) from None
            raise
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()

    def rename(self, src: str, dst: str) -> None:
        """Rename with overwrite (the pointer-swap primitive).  Uses
        FileContext's ``Rename.OVERWRITE`` — atomic on HDFS/local, exactly
        the POSIX semantics the commit protocol assumes; FileSystem.rename
        would refuse an existing destination."""
        if self._fc_cache is None:
            URI = self._jvm.java.net.URI
            conf = self._sc._jsc.hadoopConfiguration()
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                URI(self._base_uri), conf
            )
            Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
            overwrite = self._sc._gateway.new_array(Rename, 1)
            overwrite[0] = Rename.OVERWRITE
            self._fc_cache = (fc, overwrite)
        fc, overwrite = self._fc_cache
        fc.rename(self._path(src), self._path(dst), overwrite)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._path(path)))

    def isdir(self, path: str) -> bool:
        try:
            return bool(self._fs.getFileStatus(self._path(path)).isDirectory())
        except Exception:
            return False

    def listdir(self, path: str) -> list[str]:
        statuses = self._fs.listStatus(self._path(path))
        return [st.getPath().getName() for st in statuses]

    def remove(self, path: str) -> None:
        if not self._fs.delete(self._path(path), False):
            raise FileNotFoundError(path)

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._path(path), True)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._path(path)).getLen())

    def mtime(self, path: str) -> float:
        return self._fs.getFileStatus(self._path(path)).getModificationTime() / 1000.0

    def walk_files(self, root: str) -> Iterable[str]:
        root_uri = self._fs.makeQualified(self._path(root)).toString().rstrip("/")
        it = self._fs.listFiles(self._path(root), True)
        out = []
        while it.hasNext():
            p = it.next().getPath().toString()
            if p.startswith(root_uri + "/"):
                out.append(p[len(root_uri) + 1 :])
        return sorted(out)

    def open_parquet_source(self, path: str):
        """Footer reads on remote schemes pull the file through py4j — fine
        for manifests (small), wrong for data files; data-file stats on
        non-local IO are collected by a Spark job instead
        (table.stage_dataframe)."""
        return _io.BytesIO(self.read_bytes(path))


def fileio_for(location: str, spark=None) -> LocalFileIO | HadoopFileIO:
    """Pick the FileIO for a table/warehouse location by scheme: plain paths
    and ``file://`` use POSIX I/O; any other scheme routes through the
    session's Hadoop FileSystem (requires ``spark``)."""
    scheme = scheme_of(location)
    if scheme in ("", "file"):
        return LocalFileIO()
    if spark is None:
        raise ValueError(
            f"location {location!r} has scheme {scheme!r}: a SparkSession is "
            "required to resolve its Hadoop FileSystem"
        )
    return HadoopFileIO(spark, location)
