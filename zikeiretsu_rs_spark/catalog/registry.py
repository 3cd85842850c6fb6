"""Schema registry: metrics -> declared field types (+ optional names).

The reference self-describes types in each block file header
(SPEC.md:108-121) and has no stored column names at all (names come from
`with cols = [...]` at query time, SURVEY §1.3). The rebuild stores the
declared `FieldType` vector once per metrics so ingest validation and
scan schemas don't depend on reading Parquet footers.
"""

from __future__ import annotations

import json
import os
import tempfile

from ..datamodel import FieldType


class SchemaRegistry:
    def __init__(self, db_dir: str):
        self.dir = os.path.join(db_dir, "schema")

    def path(self, metrics: str) -> str:
        return os.path.join(self.dir, f"{metrics}.json")

    def save(self, metrics: str, field_types: list[FieldType]) -> None:
        os.makedirs(self.dir, exist_ok=True)
        doc = {"metrics": metrics, "field_types": [ft.value for ft in field_types]}
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(doc, f)
            os.replace(tmp, self.path(metrics))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def load(self, metrics: str) -> list[FieldType] | None:
        p = self.path(metrics)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            doc = json.load(f)
        return [FieldType(v) for v in doc["field_types"]]
