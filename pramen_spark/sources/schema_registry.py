"""Confluent-style Schema Registry support for the Kafka source/sink.

Reference: extras/.../source/KafkaAvroSource.scala:115-230 decodes values
with ABRiS, which resolves the reader schema from a Schema Registry using a
subject naming strategy (extras/.../writer/model/NamingStrategy.scala:
``topic.name`` | ``record.name`` | ``topic.record.name``).  This module is
the PySpark-native equivalent: a tiny REST client (the registry API is
plain JSON over HTTP) plus the subject-name algebra, feeding the resolved
writer schema string into ``from_avro``.

Confluent wire format: messages are ``0x00 | 4-byte big-endian schema id |
avro body`` — ``strip_confluent_header`` removes the 5-byte prefix before
``from_avro`` (Spark's decoder expects a bare Avro body).

The HTTP fetch is injectable, so subject resolution and schema lookup are
fully tested without a registry; the hot path never touches HTTP (schemas
are resolved once on the driver, the per-row work stays JVM-side).
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

NAMING_STRATEGY_TOPIC_NAME = "topic.name"
NAMING_STRATEGY_RECORD_NAME = "record.name"
NAMING_STRATEGY_TOPIC_RECORD_NAME = "topic.record.name"


@dataclass
class NamingStrategy:
    """Subject naming strategy (NamingStrategy.scala:24-110)."""

    naming_strategy: str = NAMING_STRATEGY_TOPIC_NAME
    record_name: Optional[str] = None
    record_namespace: Optional[str] = None

    def subject(self, topic: str, is_key: bool = False) -> str:
        """Schema Registry subject per Confluent conventions
        (NamingStrategy.getSubject)."""
        part = "key" if is_key else "value"
        if self.naming_strategy == NAMING_STRATEGY_TOPIC_NAME:
            return f"{topic}-{part}"
        if self.naming_strategy not in (
            NAMING_STRATEGY_RECORD_NAME,
            NAMING_STRATEGY_TOPIC_RECORD_NAME,
        ):
            raise ValueError(f"Unknown naming strategy: {self.naming_strategy}")
        name, ns = self._name_and_namespace()
        if self.naming_strategy == NAMING_STRATEGY_RECORD_NAME:
            return f"{ns}.{name}"
        return f"{topic}-{ns}.{name}"

    def _name_and_namespace(self) -> Tuple[str, str]:
        if not self.record_name or not self.record_namespace:
            raise ValueError(
                f"Record name and namespace must be defined for naming strategy "
                f"'{self.naming_strategy}'"
            )
        return self.record_name, self.record_namespace

    @classmethod
    def from_options(cls, options: Dict[str, Any], prefix: str) -> Optional["NamingStrategy"]:
        """Build from flat options, e.g. prefix='value.' reads
        ``value.naming.strategy`` / ``value.schema.record.name`` /
        ``value.schema.record.namespace`` (NamingStrategy.fromConfigOpt)."""
        strategy = options.get(f"{prefix}naming.strategy")
        if not strategy:
            return None
        return cls(
            naming_strategy=str(strategy),
            record_name=options.get(f"{prefix}schema.record.name"),
            record_namespace=options.get(f"{prefix}schema.record.namespace"),
        )


class SchemaRegistryClient:
    """Minimal Confluent Schema Registry REST client (driver-side only).

    ``http_get`` is injectable for tests; default is urllib with a timeout."""

    def __init__(self, url: str, http_get: Optional[Callable[[str], str]] = None):
        self.url = url.rstrip("/")
        self._http_get = http_get or self._default_get

    @staticmethod
    def _default_get(url: str) -> str:
        with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
            return resp.read().decode("utf-8")

    def latest_schema(self, subject: str) -> Tuple[int, str]:
        """(schema id, schema json string) of the subject's latest version
        (ABRiS downloadReaderSchemaByLatestVersion equivalent)."""
        body = json.loads(
            self._http_get(f"{self.url}/subjects/{subject}/versions/latest")
        )
        return int(body["id"]), body["schema"]

    def schema_by_id(self, schema_id: int) -> str:
        body = json.loads(self._http_get(f"{self.url}/schemas/ids/{schema_id}"))
        return body["schema"]


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte Confluent wire-format prefix (magic 0x00 + schema id)
    from a binary column, leaving the bare Avro body for ``from_avro``."""
    return F.substring(value, 6, 2147483647)


def confluent_schema_id(value: Column) -> Column:
    """Big-endian 4-byte schema id from a Confluent wire-format message
    (bytes 2-5), for auditing mixed-schema topics."""
    b = [F.conv(F.hex(F.substring(value, i, 1)), 16, 10).cast("long") for i in (2, 3, 4, 5)]
    return (b[0] * F.lit(16777216) + b[1] * F.lit(65536) + b[2] * F.lit(256) + b[3]).alias(
        "schema_id"
    )


def resolve_avro_schema(
    options: Dict[str, Any],
    topic: str,
    is_key: bool = False,
    http_get: Optional[Callable[[str], str]] = None,
) -> Tuple[str, Optional[int]]:
    """Decode-path selection (KafkaAvroSource.scala:115-230):

    - a literal ``schema`` (or ``key.schema``) option wins — no registry;
      returns (schema, None);
    - otherwise ``schema.registry.url`` + the ``value.``/``key.`` naming
      strategy resolve the subject and download the latest schema;
      returns (schema, schema_id) — a non-None id means the payload
      carries the Confluent wire-format header and must be stripped.
    """
    literal = options.get("key.schema" if is_key else "schema")
    if literal:
        return str(literal), None
    registry_url = options.get("schema.registry.url")
    if not registry_url:
        raise ValueError(
            "Avro payload needs either a literal 'schema' option or "
            "'schema.registry.url' with a naming strategy"
        )
    prefix = "key." if is_key else "value."
    strategy = NamingStrategy.from_options(options, prefix) or NamingStrategy()
    subject = strategy.subject(topic, is_key)
    client = SchemaRegistryClient(str(registry_url), http_get=http_get)
    schema_id, schema = client.latest_schema(subject)
    return schema, schema_id
