"""N-Triples source/sink (SURVEY.md §2.1 S1/S3).

The reference ingests RDF as N-Triples text (`<s> <p> <o> .` per line)
and emits result bindings as text (provenance [K], SURVEY.md §2.1).
Here both directions are DataFrame-native: the parser is a single
regexp_extract pass over spark.read.text (JVM regex inside codegen, no
Python), the sink is a formatted text write. Round-trips with the
triples view.

Supported object forms: IRIs (`<...>`), blank nodes (`_:b0`), and
literals (`"..."` with optional `@lang` / `^^<datatype>` suffix, which
is preserved verbatim in the object column). Malformed / comment lines
are dropped (mode="permissive") or raised (mode="fail").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TRIPLE_RE = (
    r"^\s*"
    r"(<[^>]*>|_:\S+)\s+"  # subject: IRI or blank node
    r"(<[^>]*>)\s+"  # predicate: IRI
    r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"  # object
    r"\s*\.\s*$"
)


def _strip_iri(col: F.Column) -> F.Column:
    """`<x>` → `x`; `"lit"` → `lit`; blank nodes / suffixed literals pass through."""
    return F.when(
        col.startswith("<"), F.regexp_replace(col, r"^<(.*)>$", r"$1")
    ).otherwise(
        F.when(
            col.rlike(r'^"(?:[^"\\]|\\.)*"$'),
            F.regexp_replace(col, r'^"(.*)"$', r"$1"),
        ).otherwise(col)
    )


def read_ntriples(
    spark: SparkSession, path: str, mode: str = "permissive", strip_iris: bool = True
) -> DataFrame:
    """Parse N-Triples text into a (subject, predicate, object)
    DataFrame. One narrow JVM regex pass; at scale this parallelizes by
    text-file split exactly like any other scan."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _TRIPLE_RE, 1).alias("subject"),
        F.regexp_extract("value", _TRIPLE_RE, 2).alias("predicate"),
        F.regexp_extract("value", _TRIPLE_RE, 3).alias("object"),
        F.col("value"),
    )
    bad = (F.col("subject") == "") & (
        ~F.col("value").rlike(r"^\s*(#.*)?$")
    )  # non-empty, non-comment, unparsed
    if mode == "fail":
        parsed = parsed.withColumn(
            "subject",
            F.when(bad, F.raise_error(F.concat(F.lit("bad N-Triples line: "), "value")))
            .otherwise(F.col("subject")),
        )
    out = parsed.filter(F.col("subject") != "").drop("value")
    if strip_iris:
        out = out.select(
            _strip_iri(F.col("subject")).alias("subject"),
            _strip_iri(F.col("predicate")).alias("predicate"),
            _strip_iri(F.col("object")).alias("object"),
        )
    return out


def read_ntriples_stream(
    spark: SparkSession, path: str, strip_iris: bool = True
) -> DataFrame:
    """Streaming N-Triples ingest: tail a directory of ``.nt`` dumps as
    a Structured Streaming source (new files become micro-batches —
    the incremental-ingest path for a continuously-arriving RDF feed,
    e.g. appending into the persisted triples store via foreachBatch).

    Same single JVM-regex parse as the batch reader — the
    transformation graph is identical, so batch-vs-stream parity holds
    by construction (tested with availableNow replay). Malformed lines
    drop (permissive only: a fail mode would poison the whole stream
    on one bad line)."""
    lines = spark.readStream.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _TRIPLE_RE, 1).alias("subject"),
        F.regexp_extract("value", _TRIPLE_RE, 2).alias("predicate"),
        F.regexp_extract("value", _TRIPLE_RE, 3).alias("object"),
    ).filter(F.col("subject") != "")
    if strip_iris:
        parsed = parsed.select(
            _strip_iri(F.col("subject")).alias("subject"),
            _strip_iri(F.col("predicate")).alias("predicate"),
            _strip_iri(F.col("object")).alias("object"),
        )
    return parsed


def write_ntriples(triples: DataFrame, path: str, iri_objects: bool = False) -> None:
    """Serialize a (subject, predicate, object) DataFrame as N-Triples
    text. Objects are written as literals unless ``iri_objects``; quotes
    and backslashes are escaped per the N-Triples grammar."""
    esc = F.regexp_replace(
        F.regexp_replace(F.col("object"), r"\\", r"\\\\"), '"', r"\\\""
    )
    obj = (
        F.concat(F.lit("<"), F.col("object"), F.lit(">"))
        if iri_objects
        else F.concat(F.lit('"'), esc, F.lit('"'))
    )
    line = F.concat(
        F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"), F.lit("> "),
        obj, F.lit(" ."),
    )
    triples.select(line.alias("value")).write.mode("overwrite").text(path)


_QUAD_RE = (
    r"^\s*"
    r"(<[^>]*>|_:\S+)\s+"  # subject
    r"(<[^>]*>)\s+"  # predicate
    r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"  # object
    r"(?:\s+(<[^>]*>))?"  # optional graph label (absent = default graph)
    r"\s*\.\s*$"
)


def read_nquads(
    spark: SparkSession, path: str, mode: str = "permissive", strip_iris: bool = True
) -> DataFrame:
    """Parse N-Quads text into a (graph, subject, predicate, object)
    quad frame — the serialization of the RDF dataset model
    (``generic_rdf.sparql_quads`` / ``build_quads_store`` consume it
    directly). Lines without a graph label land in the default graph
    (NULL), matching the executors' default-graph semantics. Same
    single JVM-regex pass as :func:`read_ntriples`."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _QUAD_RE, 1).alias("subject"),
        F.regexp_extract("value", _QUAD_RE, 2).alias("predicate"),
        F.regexp_extract("value", _QUAD_RE, 3).alias("object"),
        F.regexp_extract("value", _QUAD_RE, 4).alias("graph"),
        F.col("value"),
    )
    bad = (F.col("subject") == "") & (~F.col("value").rlike(r"^\s*(#.*)?$"))
    if mode == "fail":
        parsed = parsed.withColumn(
            "subject",
            F.when(bad, F.raise_error(F.concat(F.lit("bad N-Quads line: "), "value")))
            .otherwise(F.col("subject")),
        )
    out = parsed.filter(F.col("subject") != "").drop("value")
    # absent graph → NULL (regexp_extract returns '' for a no-match group)
    out = out.withColumn(
        "graph", F.when(F.col("graph") == "", F.lit(None)).otherwise(F.col("graph"))
    )
    if strip_iris:
        out = out.select(
            _strip_iri(F.col("graph")).alias("graph"),
            _strip_iri(F.col("subject")).alias("subject"),
            _strip_iri(F.col("predicate")).alias("predicate"),
            _strip_iri(F.col("object")).alias("object"),
        )
    else:
        out = out.select("graph", "subject", "predicate", "object")
    return out


def write_nquads(quads: DataFrame, path: str, iri_objects: bool = False) -> None:
    """Serialize a (graph, subject, predicate, object) frame as
    N-Quads; NULL-graph rows write as plain triples (default graph)."""
    esc = F.regexp_replace(
        F.regexp_replace(F.col("object"), r"\\", r"\\\\"), '"', r"\\\""
    )
    obj = (
        F.concat(F.lit("<"), F.col("object"), F.lit(">"))
        if iri_objects
        else F.concat(F.lit('"'), esc, F.lit('"'))
    )
    gpart = F.when(
        F.col("graph").isNull(), F.lit("")
    ).otherwise(F.concat(F.lit(" <"), F.col("graph"), F.lit(">")))
    line = F.concat(
        F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"), F.lit("> "),
        obj, gpart, F.lit(" ."),
    )
    quads.select(line.alias("value")).write.mode("overwrite").text(path)
