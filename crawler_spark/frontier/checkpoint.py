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
  manifest is written via temp-file + atomic rename and carries row counts,
  per-partition lineage, and config echo,
- resume = max committed wave; uncommitted partial directories from a
  crashed wave are ignored and overwritten.

Storage: all manifest/listing I/O goes through ``crawler_spark.frontier.fs``
— plain paths use POSIX ``os.replace`` (atomic); URI-scheme run dirs
(``hdfs://``, ``s3a://``, ``file:/`` ...) use the Hadoop FileSystem API of
the active SparkSession, matching the spark-submit cluster mode the CLI
advertises (jobs/crawl.py:12).

Swapping in real Iceberg = replacing ``write_table``/``read_table`` with
``df.writeTo(tbl).append()`` / snapshot reads; the engine only touches this
interface (SURVEY §4.3 #4).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.frontier.fs import LocalRunFS, join, run_fs


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
        self.fs = run_fs(run_dir)
        self.manifest_dir = join(run_dir, "manifests")
        self.fs.makedirs(self.manifest_dir)

    # -- manifest protocol --------------------------------------------------
    def _manifest_path(self, wave: int) -> str:
        return join(self.manifest_dir, f"wave-{wave}.json")

    def committed_waves(self) -> List[int]:
        waves = []
        for name in self.fs.listdir(self.manifest_dir):
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
        return json.loads(self.fs.read_text(self._manifest_path(wave)))

    def commit(self, manifest: WaveManifest) -> None:
        """Atomic: the manifest rename IS the commit point."""
        self.fs.write_text_atomic(
            self._manifest_path(manifest.wave), manifest.to_json()
        )

    # -- maintenance --------------------------------------------------------
    def vacuum(self, keep_frontier_last: int = 1) -> Dict[str, List[str]]:
        """Reclaim storage a long crawl no longer needs. An OFFLINE
        maintenance pass — run between jobs, never concurrently with a
        crawl (it deletes exactly what a crashed wave would have
        overwritten anyway, but racing a live writer is undefined).

        Removes, and nothing else:

        - **superseded frontier waves**: ``frontier`` is REPLACED each
          wave (unlike the append-only ``seen``/``pages``, which stay
          untouched — they ARE the crawl's output). Committing wave k
          writes the NEXT frontier as ``frontier/wave=k+1`` and resume
          reads exactly ``last+1`` (bfs.py:317), so only the last
          ``keep_frontier_last`` of those can ever be read again;
          earlier ones are the dead weight that dominates run-dir growth
          on long crawls;
        - **superseded bloom waves**: the last manifest records which
          bloom tables still contribute (``bloom_waves`` — compaction
          collapses the list); committed bloom dirs no longer on that
          list are unreadable leftovers. Manifests predating the field
          keep everything (the resume fallback reads all of them);
        - **uncommitted table directories**: wave dirs a resume would
          ignore and overwrite anyway (beyond ``last`` — beyond
          ``last+1`` for frontier) — crash litter; removing it makes the
          run dir listing-clean for external tools.

        Returns the deleted paths per category. Idempotent; a vacuumed
        run dir resumes bit-identically (asserted in tests)."""
        committed = self.committed_waves()
        deleted: Dict[str, List[str]] = {
            "frontier": [], "bloom": [], "uncommitted": [],
        }
        if not committed:
            return deleted
        last = committed[-1]
        live_frontier = last + 1
        keep_f = max(keep_frontier_last, 1)
        last_manifest = self.read_manifest(last)
        bloom_keep = last_manifest.get("counters", {}).get("bloom_waves")
        for name in self.fs.listdir(self.run_dir):
            if name == "manifests":
                continue
            tdir = join(self.run_dir, name)
            for part in self.fs.listdir(tdir):
                if not part.startswith("wave="):
                    continue
                try:
                    w = int(part[len("wave="):])
                except ValueError:
                    continue
                p = join(tdir, part)
                if name == "frontier":
                    if w > live_frontier:
                        self.fs.delete(p)
                        deleted["uncommitted"].append(p)
                    elif w <= live_frontier - keep_f:
                        self.fs.delete(p)
                        deleted["frontier"].append(p)
                elif w > last:
                    self.fs.delete(p)
                    deleted["uncommitted"].append(p)
                elif (
                    name == "bloom"
                    and bloom_keep is not None
                    and w not in bloom_keep
                ):
                    self.fs.delete(p)
                    deleted["bloom"].append(p)
        return deleted

    # -- table I/O ------------------------------------------------------------
    def table_wave_dir(self, table: str, wave: int) -> str:
        return join(self.run_dir, table, f"wave={wave}")

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
        paths = [p for p in paths if self.fs.exists(p)]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    # -- lineage --------------------------------------------------------------
    def lineage_of(self, spark: SparkSession, path: str) -> List[Dict]:
        """Per-output-file row counts for a just-written table directory.

        Local run dirs read parquet footers directly (cheap, no Spark job);
        remote run dirs derive counts from one small Spark job over the
        freshly written (page-cache-warm) files, since the driver can't mmap
        them."""
        if isinstance(self.fs, LocalRunFS):
            import pyarrow.parquet as pq

            out = []
            for name in sorted(os.listdir(path)):
                if name.endswith(".parquet"):
                    md = pq.read_metadata(os.path.join(path, name))
                    out.append({"file": name, "rows": md.num_rows})
            return out
        rows = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .count()
            .collect()
        )
        return sorted(
            (
                {"file": r["f"].rstrip("/").rsplit("/", 1)[-1], "rows": r["count"]}
                for r in rows
            ),
            key=lambda e: e["file"],
        )
