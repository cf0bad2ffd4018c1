"""Driver-local DataFrames that plan as ``LocalRelation``.

``spark.createDataFrame(list_of_tuples)`` in classic PySpark
parallelizes the rows into an RDD (``Scan ExistingRDD`` in the plan):
broadcasting that side of a join materializes the RDD through a full
Spark job whose tasks each spin a Python worker — measured ~0.3-0.5 s
per query at local[32] for a 750-row delete set, the dominant cost of
the jar-free MoR/DV read trackers. The Arrow-enabled pandas path
produces a genuine ``LocalRelation`` instead, which a
``BroadcastExchange`` builds DRIVER-side with no job at all.

``local_frame`` is the one spelling for every metadata-sized frame the
engine joins against a data scan (delete sets, file→sequence maps,
deletion-vector positions). At 100 TB these frames stay metadata-sized
by construction — callers that might exceed driver memory must
size-gate and fall back to a distributed scan (see
``iceberg_reader._apply_deletes``).
"""

from __future__ import annotations

import threading
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

_ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"

# the Arrow conf is session-global: two driver threads (a streaming
# micro-batch hitting a DV read while the main thread plans another)
# racing the set/restore could build one frame as Scan ExistingRDD
# and leave the conf flipped for the rest of the session — serialize
# the flip + createDataFrame critical section
_FLIP_LOCK = threading.Lock()


def local_frame(
    spark: SparkSession,
    rows: Iterable[tuple[Any, ...]],
    schema: Any,
) -> DataFrame:
    """Rows (driver-side tuples) → DataFrame planned as a
    ``LocalRelation`` under ``schema`` (DDL string or StructType).

    Empty input returns an empty frame with the same schema. Columns
    are staged as object-dtype pandas Series so nulls and non-numeric
    values (dates, decimals) reach Arrow without lossy numpy
    inference (an int column with a None would otherwise become
    float64 + NaN). The Arrow conf is flipped only around the
    ``createDataFrame`` call and restored afterwards.
    """
    import pandas as pd
    from pyspark.sql import types as T

    struct = (
        schema if isinstance(schema, T.StructType)
        else T._parse_datatype_string(schema)
    )
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], struct)
    names = [f.name for f in struct.fields]
    pdf = pd.DataFrame(
        {
            name: pd.Series([r[i] for r in rows], dtype=object)
            for i, name in enumerate(names)
        },
        columns=names,
    )
    with _FLIP_LOCK:
        try:
            prior = spark.conf.get(_ARROW_KEY)
        except Exception:
            prior = None
        spark.conf.set(_ARROW_KEY, "true")
        try:
            df = spark.createDataFrame(pdf, schema=struct)
        finally:
            if prior is None:
                spark.conf.unset(_ARROW_KEY)
            else:
                spark.conf.set(_ARROW_KEY, prior)
    return df
