"""Query registry: name → (Spark impl, DuckDB oracle SQL)."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver's parquet tables (columnar scan; filters and
    projections push down into the scan).

    events.ts is physically TIMESTAMP(NANOS); Spark reads it as long (see
    session.py nanosAsLong) and we rebuild a micros timestamp — identical to
    DuckDB's nanos→micros truncation, so oracles stay exact.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import types as T

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Integer division — nanos (~1.7e18) overflow double's 53-bit
        # mantissa, so float division would corrupt microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df
