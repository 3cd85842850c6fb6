"""Schema registry: metrics -> declared field types (+ optional names).

The reference self-describes types in each block file header
(SPEC.md:108-121) and has no stored column names at all (names come from
`with cols = [...]` at query time, SURVEY §1.3). The rebuild stores the
declared `FieldType` vector once per metrics so ingest validation and
scan schemas don't depend on reading Parquet footers. IO goes through
fsio, so the registry works on both local warehouses and object-store
URIs.
"""

from __future__ import annotations

from ..datamodel import FieldType
from . import fsio


class SchemaRegistry:
    def __init__(self, db_dir: str):
        self.dir = fsio.join(db_dir, "schema")

    def path(self, metrics: str) -> str:
        return fsio.join(self.dir, f"{metrics}.json")

    def save(self, metrics: str, field_types: list[FieldType]) -> None:
        doc = {"metrics": metrics, "field_types": [ft.value for ft in field_types]}
        fsio.write_json_atomic(self.path(metrics), doc)

    def load(self, metrics: str) -> list[FieldType] | None:
        p = self.path(metrics)
        if not fsio.exists(p):
            return None
        doc = fsio.read_json(p)
        return [FieldType(v) for v in doc["field_types"]]
