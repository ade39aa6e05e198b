"""Kafka batch source with per-partition offset management.

Reference: extras/.../source/KafkaAvroSource.scala:115-230 — batch-reads a
topic between committed offsets by rendering Pramen's per-partition Kafka
offsets into Spark's ``startingOffsets`` / ``endingOffsets`` JSON
(:166-190), then decodes the Avro value via Schema Registry.

Spark mapping: ``spark.read.format("kafka")`` with the same offset JSON.
Payload decoding is pluggable: ``json`` (always available) via
``from_json``, ``avro`` gated on the spark-avro package, ``binary``
passthrough. The offset-JSON rendering and offset algebra are pure and
fully tested without a broker; the read itself needs the
spark-sql-kafka connector on the cluster (import-gated here).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pramen_spark.api import Source

EARLIEST = -2
LATEST = -1


def kafka_offsets_json(topic: str, partition_offsets: Dict[int, int]) -> str:
    """Render per-partition offsets to Spark's startingOffsets/endingOffsets
    JSON: {"topic": {"0": 123, "1": -1}} (KafkaAvroSource.scala:166-190).
    -1 = latest, -2 = earliest."""
    return json.dumps(
        {topic: {str(p): int(o) for p, o in sorted(partition_offsets.items())}},
        separators=(",", ":"),
    )


def next_offsets(committed: Optional[Dict[int, int]]) -> Dict[int, int]:
    """Starting offsets for the next batch: one past each committed offset,
    or earliest when nothing was committed."""
    if not committed:
        return {}
    return {p: o + 1 for p, o in committed.items()}


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: B018
        return True
    except Exception:
        return False


class KafkaSource(Source):
    """Options:
    - ``kafka.bootstrap.servers`` (required)
    - ``topic`` (required)
    - ``payload.format``: json | avro | binary (default json)
    - ``schema``: DDL schema of the JSON/Avro value
    - any ``option.*`` entries pass through to the Kafka reader
    """

    def has_info_date_column(self) -> bool:
        return False

    def _reader(self, starting: str, ending: str):
        if not kafka_available(self.spark):
            raise RuntimeError(
                "The spark-sql-kafka connector is not on the classpath; add "
                "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
            )
        reader = (
            self.spark.read.format("kafka")
            .option("kafka.bootstrap.servers", self.options["kafka.bootstrap.servers"])
            .option("subscribe", self.options["topic"])
            .option("startingOffsets", starting)
            .option("endingOffsets", ending)
        )
        for k, v in self.options.items():
            if k.startswith("option."):
                reader = reader.option(k[len("option.") :], v)
        return reader

    def _decode(self, df: DataFrame) -> DataFrame:
        payload = self.options.get("payload.format", "json")
        if payload == "binary":
            return df
        if payload == "json":
            schema = self.options.get("schema")
            if not schema:
                raise ValueError("payload.format=json requires a 'schema' DDL option")
            return df.select(
                F.col("key").cast("string").alias("kafka_key"),
                F.from_json(F.col("value").cast("string"), schema).alias("v"),
                "topic",
                "partition",
                "offset",
                "timestamp",
            ).select("kafka_key", "v.*", "topic", "partition", "offset", "timestamp")
        if payload == "avro":
            try:
                from pyspark.sql.avro.functions import from_avro
            except ImportError as e:  # pragma: no cover - env without spark-avro
                raise RuntimeError("spark-avro is not available") from e
            from pramen_spark.sources.schema_registry import (
                resolve_avro_schema,
                strip_confluent_header,
            )

            # literal 'schema' option, or Schema Registry lookup via
            # schema.registry.url + value.naming.strategy (ABRiS-equivalent;
            # KafkaAvroSource.scala:115-230). A registry schema implies the
            # Confluent wire format, whose 5-byte header must be stripped.
            schema, schema_id = resolve_avro_schema(
                self.options, self.options["topic"], is_key=False,
                http_get=self.options.get("_http_get"),
            )
            value_col = F.col("value") if schema_id is None else strip_confluent_header(F.col("value"))
            return df.select(
                from_avro(value_col, schema).alias("v"),
                "topic",
                "partition",
                "offset",
                "timestamp",
            ).select("v.*", "topic", "partition", "offset", "timestamp")
        raise ValueError(f"Unknown payload.format '{payload}'")

    def get_data(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> DataFrame:
        topic = self.options["topic"]
        starting = kafka_offsets_json(topic, {p: EARLIEST for p in self._partitions()}) \
            if self._partitions() else "earliest"
        ending = kafka_offsets_json(topic, {p: LATEST for p in self._partitions()}) \
            if self._partitions() else "latest"
        return self._decode(self._reader(starting, ending).load())

    def get_data_incremental(
        self,
        query: Any,
        info_date: Optional[_dt.date],
        offset_from: Optional[Any],
        offset_to: Optional[Any],
    ) -> DataFrame:
        """offset_from/offset_to are per-partition dicts {partition: offset}
        (the KafkaType offset of the ledger), possibly wrapped in OffsetValue."""
        from pramen_spark.sql.generators import offset_raw_value

        offset_from = offset_raw_value(offset_from)
        offset_to = offset_raw_value(offset_to)
        for name, v in (("offset_from", offset_from), ("offset_to", offset_to)):
            if v is not None and not isinstance(v, dict):
                raise TypeError(
                    f"KafkaSource needs per-partition offset dicts "
                    f"{{partition: offset}}; got {name}={v!r} "
                    f"({type(v).__name__}). String-encoded ledger offsets must "
                    f"be decoded to a KAFKA offset mapping before use."
                )
        topic = self.options["topic"]
        starting = (
            kafka_offsets_json(topic, next_offsets(offset_from))
            if offset_from
            else "earliest"
        )
        ending = (
            kafka_offsets_json(topic, offset_to) if offset_to else "latest"
        )
        return self._decode(self._reader(starting, ending).load())

    def _partitions(self) -> Dict[int, int]:
        return {}
