"""Text source formats (SURVEY.md §2.1 S-family extension): JSONL and
CSV readers/writers with explicit-schema discipline.

The reference's only text format is N-Triples (sources/ntriples.py);
a pipeline engine also meets JSON-lines (the lingua franca of
web-scraped training data) and CSV. Both are thin wrappers over
Spark's native sources with the two decisions that matter at 100 TB
made explicit:

* **Schema is mandatory.** Inference (`inferSchema`, `schema-less
  json`) reads the data TWICE and guesses types per-run — a silent
  full extra pass at scale and a correctness hazard (a column of
  "01"s becomes int today, string tomorrow). Callers pass a DDL
  string; the files are read once, deterministically.
* **Corrupt records are quarantined, not dropped.** PERMISSIVE mode
  with an explicit `_corrupt_record` column keeps bad lines
  observable (count them, route them to a dead-letter sink) instead
  of silently vanishing — the difference between a pipeline you can
  audit and one you can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines with an explicit DDL schema, one pass.

    With ``keep_corrupt`` the frame carries a ``_corrupt_record``
    column holding the raw text of unparseable lines (NULL for good
    rows); without it corrupt lines are dropped (DROPMALFORMED)."""
    if keep_corrupt:
        full = f"{schema}, {CORRUPT_COL} string"
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Read CSV with an explicit DDL schema (never inferSchema — that
    is a second full read of the data)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
