"""Schema-Registry-style Avro resolution (reference:
extras/.../source/KafkaAvroSource.scala:115-230,
extras/.../writer/model/NamingStrategy.scala)."""

import json

import pytest

from pramen_spark.sources.schema_registry import (
    NamingStrategy,
    SchemaRegistryClient,
    resolve_avro_schema,
)

AVRO_SCHEMA = json.dumps(
    {"type": "record", "name": "Evt", "namespace": "com.example",
     "fields": [{"name": "id", "type": "long"}]}
)


def fake_http(responses):
    calls = []

    def get(url):
        calls.append(url)
        for suffix, body in responses.items():
            if url.endswith(suffix):
                return json.dumps(body)
        raise AssertionError(f"Unexpected URL {url}")

    get.calls = calls
    return get


class TestNamingStrategy:
    def test_topic_name_subjects(self):
        s = NamingStrategy("topic.name")
        assert s.subject("my.topic", is_key=False) == "my.topic-value"
        assert s.subject("my.topic", is_key=True) == "my.topic-key"

    def test_record_name_subject(self):
        s = NamingStrategy("record.name", "Evt", "com.example")
        assert s.subject("anything") == "com.example.Evt"
        assert s.subject("anything", is_key=True) == "com.example.Evt"

    def test_topic_record_name_subject(self):
        s = NamingStrategy("topic.record.name", "Evt", "com.example")
        assert s.subject("t1") == "t1-com.example.Evt"

    def test_record_name_requires_name_and_namespace(self):
        with pytest.raises(ValueError, match="name and namespace"):
            NamingStrategy("record.name").subject("t")

    def test_unknown_strategy(self):
        with pytest.raises(ValueError, match="Unknown naming strategy"):
            NamingStrategy("bogus").subject("t")

    def test_from_options(self):
        opts = {"value.naming.strategy": "topic.record.name",
                "value.schema.record.name": "Evt",
                "value.schema.record.namespace": "com.example"}
        s = NamingStrategy.from_options(opts, "value.")
        assert s.subject("t") == "t-com.example.Evt"
        assert NamingStrategy.from_options(opts, "key.") is None


class TestSchemaRegistryClient:
    def test_latest_schema(self):
        get = fake_http({"/subjects/t-value/versions/latest":
                         {"id": 7, "version": 3, "schema": AVRO_SCHEMA}})
        sid, schema = SchemaRegistryClient("http://sr:8081/", http_get=get).latest_schema("t-value")
        assert (sid, schema) == (7, AVRO_SCHEMA)
        assert get.calls == ["http://sr:8081/subjects/t-value/versions/latest"]

    def test_schema_by_id(self):
        get = fake_http({"/schemas/ids/7": {"schema": AVRO_SCHEMA}})
        assert SchemaRegistryClient("http://sr:8081", http_get=get).schema_by_id(7) == AVRO_SCHEMA


class TestResolveAvroSchema:
    def test_literal_schema_wins(self):
        schema, sid = resolve_avro_schema({"schema": AVRO_SCHEMA}, "t")
        assert schema == AVRO_SCHEMA and sid is None  # no wire-format header

    def test_registry_resolution_topic_name(self):
        get = fake_http({"/subjects/t-value/versions/latest": {"id": 9, "schema": AVRO_SCHEMA}})
        schema, sid = resolve_avro_schema(
            {"schema.registry.url": "http://sr:8081"}, "t", http_get=get)
        assert schema == AVRO_SCHEMA and sid == 9  # header must be stripped

    def test_registry_resolution_with_strategy(self):
        get = fake_http({"/subjects/com.example.Evt/versions/latest":
                         {"id": 2, "schema": AVRO_SCHEMA}})
        opts = {"schema.registry.url": "http://sr:8081",
                "value.naming.strategy": "record.name",
                "value.schema.record.name": "Evt",
                "value.schema.record.namespace": "com.example"}
        schema, sid = resolve_avro_schema(opts, "t", http_get=get)
        assert sid == 2

    def test_key_resolution(self):
        get = fake_http({"/subjects/t-key/versions/latest": {"id": 4, "schema": AVRO_SCHEMA}})
        schema, sid = resolve_avro_schema(
            {"schema.registry.url": "http://sr:8081"}, "t", is_key=True, http_get=get)
        assert sid == 4

    def test_no_schema_no_registry_raises(self):
        with pytest.raises(ValueError, match="schema.registry.url"):
            resolve_avro_schema({}, "t")


class TestConfluentWireFormat:
    def test_strip_header_and_schema_id(self, spark):
        from pramen_spark.sources.schema_registry import (
            confluent_schema_id,
            strip_confluent_header,
        )

        payload = bytes([0, 0, 0, 1, 200]) + b"avrobody"
        df = spark.createDataFrame([(payload,)], "value binary")
        row = df.select(
            strip_confluent_header(df["value"]).alias("body"),
            confluent_schema_id(df["value"]),
        ).collect()[0]
        assert bytes(row["body"]) == b"avrobody"
        assert row["schema_id"] == 456  # 0x000001C8

    def test_kafka_offset_dict_validation(self, spark):
        from pramen_spark.sources.kafka_source import KafkaSource

        src = KafkaSource(spark, {"kafka.bootstrap.servers": "b:9092", "topic": "t"})
        with pytest.raises(TypeError, match="per-partition offset dicts"):
            src.get_data_incremental(None, None, "123", None)


class TestJdbcDatetimeOffsetCoercion:
    def test_epoch_millis_coerced(self, spark):
        import datetime as dt

        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(spark, {"url": "jdbc:h2:mem:x", "offset.type": "datetime"})
        ov = src._as_offset_value(1704888000000)  # 2024-01-10T12:00:00Z
        assert ov.value == dt.datetime(2024, 1, 10, 12, 0, tzinfo=dt.timezone.utc)
        ov2 = src._as_offset_value("1704888000000")
        assert ov2.value == ov.value

    def test_datetime_passthrough_and_bad_value(self, spark):
        import datetime as dt

        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(spark, {"url": "jdbc:h2:mem:x", "offset.type": "datetime"})
        ts = dt.datetime(2024, 1, 10, 8, 0)
        assert src._as_offset_value(ts).value == ts
        with pytest.raises(TypeError, match="epoch-millis"):
            src._as_offset_value("not-a-date")
