"""JSONL source/sink (reference S2/S3 operators).

The reference's interchange format is line-delimited JSON written
with ensure_ascii=False (preprocessor.py:285-296, extractor.py:610-615,
classifier.py:258-265).  Spark reads JSONL natively; the sink is
to_json over a struct with ignoreNullFields=false so null fields are
emitted explicitly like json.dump does (Spark's default would drop
them) and non-ASCII stays raw UTF-8 (= ensure_ascii=False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

TRIPLE_JSON_FIELDS = ("subject", "predicate", "object", "message_id",
                      "segment_id", "timestamp", "confidence")


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | None = None) -> DataFrame:
    """S2: line-delimited JSON scan (permissive, schema optional)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str,
                fields: tuple[str, ...] | None = None,
                mode: str = "overwrite") -> None:
    """S3: one JSON object per line, field order preserved, nulls
    kept, UTF-8 unescaped."""
    cols = list(fields or df.columns)
    line = F.to_json(F.struct(*[F.col(c) for c in cols]),
                     {"ignoreNullFields": "false"})
    df.select(line.alias("value")).write.mode(mode).text(path)
