"""Document-corpus IO: JSONL (the lingua franca of LLM corpus
interchange — one JSON object per line) and partitioned parquet.

Scale notes:
- JSONL reads take an EXPLICIT schema: schema inference is a full
  extra pass over 100 TB and silently unions drifting field sets;
  a declared schema also lets the reader drop unknown fields at
  parse time (column pruning inside the JSON parser).
- Parquet writes partition by `source` so per-domain reads (the
  cap/balance operators) prune directories instead of scanning the
  corpus; JSONL stays flat because line-oriented interchange has no
  pushdown anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_documents_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, gzip-free (splittable for re-read)."""
    df.write.mode(mode).json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read a JSONL corpus with a declared schema (no inference pass).

    Malformed lines land in PERMISSIVE mode as all-null rows rather
    than failing the job — at corpus scale a handful of broken lines
    must not kill a 1000-executor read; filter `doc_id IS NULL`
    afterwards to audit them.
    """
    return spark.read.schema(schema or DOC_SCHEMA).json(path)


def write_documents_parquet(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Parquet partitioned by source: per-domain operators read only
    their directories (PartitionFilters, not data filters)."""
    df.write.mode(mode).partitionBy("source").parquet(path)


def read_documents_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
