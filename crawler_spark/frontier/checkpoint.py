"""WaveCommit: atomic per-wave snapshot layer with lineage + metrics.

The north_rule demands Iceberg-style committed waves: each crawl wave
atomically appends to ``seen`` and ``pages``, replaces ``frontier``, and
records per-partition lineage counters, so a killed job resumes mid-frontier
without re-fetching seen URLs.

The sandbox has no Iceberg runtime jar (verified: no iceberg/delta among
the pyspark 4.1.2 jars, no network to fetch one), so this module implements
the exact commit contract on plain parquet + a manifest protocol:

- each table writes to ``<run>/<table>/wave=<k>/`` (hive-partition layout,
  Iceberg-compatible: partitioned by wave, bucket-friendly by url_hash),
- a wave is committed iff ``<run>/manifests/wave-<k>.json`` exists; the
  manifest is written via temp-file + ``os.replace`` (atomic rename on
  POSIX) and carries row counts, per-partition lineage, and config echo,
- resume = max committed wave; uncommitted partial directories from a
  crashed wave are ignored and overwritten.

Swapping in real Iceberg = replacing ``write_table``/``read_table`` with
``df.writeTo(tbl).append()`` / snapshot reads; the engine only touches this
interface (SURVEY §4.3 #4).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class WaveManifest:
    wave: int
    counters: Dict[str, int] = field(default_factory=dict)
    lineage: Dict[str, List[Dict]] = field(default_factory=dict)  # table -> per-partition rows
    tables: Dict[str, str] = field(default_factory=dict)  # table -> relative path
    config: Dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "wave": self.wave,
                "counters": self.counters,
                "lineage": self.lineage,
                "tables": self.tables,
                "config": self.config,
            },
            indent=1,
            sort_keys=True,
        )


class WaveCommit:
    def __init__(self, run_dir: str) -> None:
        self.run_dir = run_dir
        self.manifest_dir = os.path.join(run_dir, "manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest protocol --------------------------------------------------
    def _manifest_path(self, wave: int) -> str:
        return os.path.join(self.manifest_dir, f"wave-{wave}.json")

    def committed_waves(self) -> List[int]:
        waves = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("wave-") and name.endswith(".json"):
                try:
                    waves.append(int(name[5:-5]))
                except ValueError:
                    continue
        return sorted(waves)

    def last_committed(self) -> Optional[int]:
        waves = self.committed_waves()
        return waves[-1] if waves else None

    def read_manifest(self, wave: int) -> Dict:
        with open(self._manifest_path(wave)) as f:
            return json.load(f)

    def commit(self, manifest: WaveManifest) -> None:
        """Atomic: the manifest rename IS the commit point."""
        fd, tmp = tempfile.mkstemp(dir=self.manifest_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(manifest.to_json())
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._manifest_path(manifest.wave))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- table I/O ------------------------------------------------------------
    def table_wave_dir(self, table: str, wave: int) -> str:
        return os.path.join(self.run_dir, table, f"wave={wave}")

    def write_table(self, df: DataFrame, table: str, wave: int) -> str:
        """Write one wave partition of a table. Overwrite mode: a re-run of
        an uncommitted wave replaces the partial output (idempotent)."""
        path = self.table_wave_dir(table, wave)
        df.write.mode("overwrite").parquet(path)
        return path

    def read_table(
        self, spark: SparkSession, table: str, waves: Optional[List[int]] = None
    ) -> Optional[DataFrame]:
        """Read committed waves of a table (all committed waves by default).
        Returns None when nothing is committed yet."""
        if waves is None:
            waves = []
            for w in self.committed_waves():
                m = self.read_manifest(w)
                if table in m.get("tables", {}):
                    waves.append(w)
        paths = [self.table_wave_dir(table, w) for w in waves]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        return spark.read.parquet(*paths)
