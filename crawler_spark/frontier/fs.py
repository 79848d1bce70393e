"""Storage-agnostic run-directory I/O for WaveCommit.

Plain POSIX paths use ``os``/``tempfile`` directly (fast path, atomic
``os.replace``). Any path carrying a URI scheme (``file:``, ``hdfs:``,
``s3a:``, ``gs:``, ...) routes through the Hadoop FileSystem API of the
active SparkSession's JVM — the same filesystem connectors the cluster's
parquet I/O uses, so a ``--run-dir`` works anywhere ``spark.read.parquet``
does (the north_rule's spark-submit cluster mode; jobs/crawl.py:12).

Atomicity note: the manifest-commit contract is "rename marks the commit".
``os.replace`` is atomic on POSIX; Hadoop ``rename`` is atomic on HDFS.
On object stores (S3A) rename is copy+delete — the standard Hadoop
committer caveat; a crashed commit leaves either no manifest (wave re-runs,
idempotent) or a complete manifest, never a torn file, because the rename
source is fully written and closed first.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import uuid
from typing import List

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def has_scheme(path: str) -> bool:
    # "C:\..." windows drives are not a concern on cluster/POSIX targets
    return bool(_SCHEME_RE.match(path))


def join(base: str, *parts: str) -> str:
    """Path join that works for both POSIX paths and URIs."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


class LocalRunFS:
    """os-backed implementation (no SparkSession needed)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> List[str]:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        d = os.path.dirname(path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def delete(self, path: str) -> None:
        """Recursive delete; missing path is a no-op (vacuum idempotency)."""
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.unlink(path)


class HadoopRunFS:
    """Hadoop FileSystem implementation via the active SparkSession's JVM.

    Handles every scheme the cluster has connectors for (hdfs://, s3a://,
    gs://, abfs://, and file:/ for testing the remote code path locally).
    """

    def __init__(self, base: str) -> None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"run_dir {base!r} has a URI scheme, which requires an active "
                "SparkSession (Hadoop FileSystem API) — start the session "
                "before constructing WaveCommit"
            )
        self._jvm = spark._jvm
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI.create(base),
            spark._jsc.hadoopConfiguration(),
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def listdir(self, path: str) -> List[str]:
        if not self.exists(path):
            return []
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._p(path))
        ]

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False
            )
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + ".tmp-" + uuid.uuid4().hex
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self._p(path)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        if not self._fs.rename(self._p(tmp), dst):
            raise IOError(f"rename {tmp} -> {path} failed")

    def delete(self, path: str) -> None:
        """Recursive delete; missing path is a no-op (vacuum idempotency)."""
        if self.exists(path):
            self._fs.delete(self._p(path), True)


def run_fs(path: str):
    return HadoopRunFS(path) if has_scheme(path) else LocalRunFS()
