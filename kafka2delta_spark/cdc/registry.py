"""Schema-registry access with caching.

Reference behavior: fetch Avro-JSON schema strings by ID over HTTP with a
caching client (ref utils/utils.py:11-21), and derive primary-key column
names from the *key* schema's field list (ref utils/utils.py:24-34, used at
ref stream/stream.py:70-73).

Here the client is an interface with two implementations:
  * ``SchemaRegistryClient`` — real HTTP client (Confluent REST
    ``GET /schemas/ids/{id}``), driver-side, memoized. Gated on ``urllib``
    only — no extra deps.
  * ``InMemorySchemaRegistry`` — dict-backed fake for tests (replaces the
    reference's live-registry test dependency, ref conftest.py:20-141).

Module-level helpers keep the reference's functional API shape.
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Protocol


class SchemaRegistry(Protocol):
    def get_json_schema(self, schema_id: int) -> str: ...


class SchemaRegistryClient:
    """Confluent REST registry client, memoized per instance.

    Registry schema IDs are globally unique and immutable, so an unbounded
    per-process cache is safe (the reference relies on the same property,
    ref utils/utils.py:18-21).
    """

    def __init__(self, base_url: str, timeout_s: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self._cache: dict[int, str] = {}

    def get_json_schema(self, schema_id: int) -> str:
        if schema_id not in self._cache:
            import urllib.request

            with urllib.request.urlopen(
                f"{self.base_url}/schemas/ids/{schema_id}", timeout=self.timeout_s
            ) as resp:
                body = json.loads(resp.read().decode("utf-8"))
            self._cache[schema_id] = body["schema"]
        return self._cache[schema_id]


class InMemorySchemaRegistry:
    """Dict-backed registry for tests; register() returns monotonic IDs
    (monotonicity is what the reference's schema-evolution ordering relies
    on, ref stream/stream.py:60-66)."""

    def __init__(self) -> None:
        self._schemas: dict[int, str] = {}
        self._next_id = 1

    def register(self, avro_json_schema: str) -> int:
        sid = self._next_id
        self._next_id += 1
        self._schemas[sid] = avro_json_schema
        return sid

    def get_json_schema(self, schema_id: int) -> str:
        return self._schemas[schema_id]


@lru_cache(maxsize=64)
def _client_for(url: str) -> SchemaRegistryClient:
    return SchemaRegistryClient(url)


def get_json_schema(schema_registry_url: str, schema_id: int) -> str:
    """Functional form matching ref utils/utils.py:11-21."""
    return _client_for(schema_registry_url).get_json_schema(schema_id)


def column_names_from_schema_str(avro_json_schema: str) -> list[str]:
    """Field names of a record schema (PK columns when given a key schema)."""
    return [f["name"] for f in json.loads(avro_json_schema)["fields"]]


def get_column_names_from_schema(schema_registry_url: str, schema_id: int) -> list[str]:
    """Functional form matching ref utils/utils.py:24-34."""
    return column_names_from_schema_str(get_json_schema(schema_registry_url, schema_id))
