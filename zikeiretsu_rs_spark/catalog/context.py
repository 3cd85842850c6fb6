"""Database context: warehouse root + named databases.

Reference: `DBContext` / `Database` (engine/context.rs:22-137) and the
TOML config (config/mod.rs:35-109). A database's local directory is
`<data_dir>/<db_name>` (Database::as_local_db_dir, context.rs:67-96).
The `cloud_storage` URI plays the role of the reference's GCS bucket
sync: point it at s3a://... or gs://... and Spark reads/writes the
object store directly (no download/upload state machine, SURVEY §2.1 S5).
Metadata JSONs (manifest/schema) go through `fsio` (pyarrow.fs), so the
ingest/query path works end-to-end against a URI warehouse — exercised
in tests via file:// (`tests/test_fsio_cloud.py`). Rename-based
maintenance (compaction, purge, rollup refresh) requires a local
warehouse and refuses object-store URIs with an actionable error.

Warehouse layout per database:
    <data_dir>/<db>/block/<metrics>/dt=YYYY-MM-DD/*.parquet   data
    <data_dir>/<db>/blocklist/<metrics>.json                  manifest
    <data_dir>/<db>/schema/<metrics>.json                     field types
"""

from __future__ import annotations

import json
import os
import tomllib
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Database:
    name: str
    cloud_storage: str | None = None  # object-store URI prefix (optional)

    def local_dir(self, data_dir: str) -> str:
        if self.cloud_storage:
            return self.cloud_storage.rstrip("/") + "/" + self.name
        return os.path.join(data_dir, self.name)


@dataclass
class DBContext:
    data_dir: str
    default_database: str = "default"
    databases: dict[str, Database] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.default_database not in self.databases:
            self.databases[self.default_database] = Database(self.default_database)

    def database(self, name: str | None = None) -> Database:
        name = name or self.default_database
        if name not in self.databases:
            raise KeyError(f"database is not found: {name}")
        return self.databases[name]

    def db_dir(self, name: str | None = None) -> str:
        return self.database(name).local_dir(self.data_dir)

    @staticmethod
    def from_config_file(path: str) -> "DBContext":
        """Load from TOML (mirroring config/mod.rs:35-109) or JSON."""
        with open(path, "rb") as f:
            cfg = tomllib.load(f) if path.endswith(".toml") else json.load(f)
        databases = {
            d["name"]: Database(d["name"], d.get("cloud_storage"))
            for d in cfg.get("databases", [])
        }
        ctx = DBContext(
            data_dir=cfg["data_dir"],
            default_database=cfg.get("default_database")
            or (next(iter(databases)) if databases else "default"),
            databases=databases,
        )
        return ctx
