"""Envelope schemas and frame decoding for the ingest layer.

S1 (Kafka SQL source, ods/ProduceKafkaDBDataToODS.scala:62-80): the
reference declares each topic as a JSON table whose payload column is
``map<string,string>``. S2 (utils/MyKafkaUtil.scala:10-12) consumes the
raw string and parses downstream. Both collapse to the same Spark shape:
a (key, value) binary frame → ``from_json(value, schema)`` → columns.

S3 (utils/MySQLUtil.scala:11-65): a 5-minute JDBC poll of the routing
config, broadcast to the stream. In Spark a stream-static join re-reads
the static side every micro-batch, which subsumes the poll; the adapter
here is the batch read that the join re-executes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import MapType, StringType, StructField, StructType

_S = StringType()

# CDC envelope (maxwell-style): ods/ProduceKafkaDBDataToODS.scala:64-72 —
# all strings except the data map (SURVEY §1.2)
CDC_ENVELOPE_SCHEMA = StructType(
    [
        StructField("database", _S),
        StructField("table", _S),
        StructField("type", _S),
        StructField("ts", _S),
        StructField("xid", _S),
        StructField("commit", _S),
        StructField("data", MapType(_S, _S)),
    ]
)

# app-log envelope: ods/ProduceKafkaLogDataToODS.scala:49-51
LOG_ENVELOPE_SCHEMA = StructType(
    [
        StructField("logtype", _S),
        StructField("data", MapType(_S, _S)),
    ]
)

# dim routing config row: utils/MySQLUtil.scala:22 (dim_tbl_config_info)
CONFIG_SCHEMA = StructType(
    [
        StructField("tbl_name", _S),
        StructField("tbl_db", _S),
        StructField("pk_col", _S),
        StructField("cols", _S),
        StructField("phoenix_tbl_name", _S),
    ]
)


def decode_json_frames(frames: DataFrame, schema: StructType) -> DataFrame:
    """(key, value) Kafka-shaped frames → envelope columns.

    ``value`` may be binary or string; JSON that doesn't parse yields a
    row of nulls (kept, like the reference's fastjson behavior of
    null-propagating rather than failing the job).
    """
    return frames.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e")
    ).select("e.*")


def decode_json_frames_with_dlq(
    frames: DataFrame, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Decode with a dead-letter split: (good, quarantined).

    Rows whose JSON fails to parse (or isn't an object) keep their raw
    frame in the quarantine stream instead of silently becoming all-null
    rows — the production upgrade over the reference's null-propagating
    fastjson parse. The split is two filters off ONE decoded projection
    (Catalyst reuses the parse; no double JSON work), so it composes with
    streaming and ``foreachBatch`` multi-sink fan-out.
    """
    raw = F.col("value").cast("string")
    # PERMISSIVE from_json maps unparseable input to an all-null struct —
    # indistinguishable from a legitimately-sparse record — so route the
    # raw text into an explicit corrupt-record field instead
    schema_with_corrupt = StructType(
        list(schema.fields) + [StructField("__corrupt", _S)]
    )
    decoded = frames.select(
        F.from_json(
            raw,
            schema_with_corrupt,
            {"columnNameOfCorruptRecord": "__corrupt"},
        ).alias("e")
    )
    good = decoded.filter(F.col("e.__corrupt").isNull()).select("e.*").drop(
        "__corrupt"
    )
    bad = decoded.filter(F.col("e.__corrupt").isNotNull()).select(
        F.col("e.__corrupt").alias("raw_value")
    )
    return good, bad


def kafka_json_source(
    spark: SparkSession,
    schema: StructType,
    topic: str | None = None,
    brokers: str | None = None,
    path: str | None = None,
    starting_offsets: str = "earliest",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1: streaming envelope source.

    With ``brokers``+``topic`` this is the real Kafka reader (options map
    1:1 to the reference's DDL: brokers, topic, scan.startup.mode). With
    ``path`` it falls back to a JSON-lines file stream carrying the same
    frames — byte-identical decode path, so pipelines test without a
    broker. ``max_files_per_trigger`` caps micro-batch size on the file
    path (≙ Kafka's maxOffsetsPerTrigger rate limit).
    """
    if brokers and topic:
        frames = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
        return decode_json_frames(frames, schema)
    if not path:
        raise ValueError("need brokers+topic or a file path")
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    frames = reader.load(path).select(F.col("value"))
    return decode_json_frames(frames, schema)


def read_config_table(spark: SparkSession, source: str | list[tuple]) -> DataFrame:
    """S3: the dim routing config as a small DataFrame.

    ``source`` is a parquet/JSON path or a list of literal rows. Called
    inside a stream-static join, Spark re-reads it every micro-batch —
    fresher than the reference's 5-minute poll (SURVEY §2.1 S3).
    """
    if isinstance(source, str):
        if source.endswith(".json") or source.endswith(".jsonl"):
            return spark.read.schema(CONFIG_SCHEMA).json(source)
        return spark.read.parquet(source)
    return spark.createDataFrame(source, CONFIG_SCHEMA)
