"""Snapshot-manifest table storage (Iceberg-fallback, SURVEY §7 risk #6).

The north_rule requires idempotent, checkpoint-resumable crawl rounds. With no
Iceberg runtime in the sandbox, this layer provides the same contract over
plain parquet:

- each table version is written to ``<root>/<table>/v=<round>/`` (write to a
  ``_tmp`` dir, then atomic rename);
- ``<root>/MANIFEST.json`` records the committed round and per-table versions,
  and is replaced atomically (write + os.replace);
- resume = read MANIFEST, load each table at its committed version; a crashed
  round leaves only orphan ``v=k`` dirs that the re-run overwrites.

Swap-in for real Iceberg is a config switch: the engine only uses
``read_table/write_table/commit_round/load_manifest``.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Manifest:
    committed_round: int = -1
    tables: Dict[str, int] = field(default_factory=dict)  # table -> version
    meta: Dict[str, object] = field(default_factory=dict)


class SnapshotStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest -------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def load_manifest(self) -> Optional[Manifest]:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p, "r", encoding="utf-8") as f:
            d = json.load(f)
        return Manifest(
            committed_round=d["committed_round"],
            tables=d.get("tables", {}),
            meta=d.get("meta", {}),
        )

    def commit(self, manifest: Manifest) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "committed_round": manifest.committed_round,
                    "tables": manifest.tables,
                    "meta": manifest.meta,
                },
                f,
                indent=2,
            )
        os.replace(tmp, self._manifest_path())

    # -- tables ---------------------------------------------------------------
    def _table_dir(self, table: str, version: int) -> str:
        return os.path.join(self.root, table, f"v={version}")

    def write_table(self, df: DataFrame, table: str, version: int) -> str:
        final = self._table_dir(table, version)
        tmp = final + "_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)  # idempotent re-run of a crashed round
        os.replace(tmp, final)
        return final

    def read_table(self, spark: SparkSession, table: str, version: int) -> DataFrame:
        return spark.read.parquet(self._table_dir(table, version))

    def read_committed(self, spark: SparkSession, table: str) -> Optional[DataFrame]:
        m = self.load_manifest()
        if m is None or table not in m.tables:
            return None
        return self.read_table(spark, table, m.tables[table])
