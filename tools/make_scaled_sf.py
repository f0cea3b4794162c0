"""Synthesize a larger scale factor from sf0.1 by replica-scaling
(VERDICT r6 #5: the first MEASURED scaling evidence — testdata ships
nothing above sf0.1 and is read-only).

Each replica applies a key-column offset (stride 10^9 — far above any
base key) so referential integrity holds and the FK entity graph grows
as disjoint replica subgraphs sharing only the fixed nation/region
spine (whose hub degree grows linearly — the realistic skew path).
Two content adjustments keep the DATA character honest at scale:

- ``documents.text`` tokens are prefixed per replica (``r3_tok``), so
  replicas are independent corpora — naive duplication would hand the
  near-dup queries an artificial worst case (every doc x10 exact
  copies) and distort the scaling measurement.
- ``embeddings.embedding`` gets a deterministic per-replica nudge on
  the first component so ANN/k-means replicas aren't bit-identical
  point clouds.

region/nation stay fixed (TPC-H semantics: they never scale).

Usage: python tools/make_scaled_sf.py [factor] [out_dir]
       (defaults: 10, /root/repo/.scaledata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rdf_mapreduce_joins_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
STRIDE = 1_000_000_000

# key columns offset per replica, per table
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]


def scale_table(spark, name: str, factor: int, out_dir: str) -> int:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(factor):
        d = df
        for c in OFFSET_COLS[name]:
            d = d.withColumn(c, (F.col(c) + F.lit(i * STRIDE)).cast("long"))
        if name == "documents" and i > 0:
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{i}_$1")
            )
        if name == "embeddings" and i > 0:
            d = d.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.lit(i * 1e-3)).cast(
                            "float"
                        )
                    ),
                    F.slice("embedding", 2, 100000),
                ),
            )
        parts.append(d)
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    path = f"{out_dir}/{name}.parquet"
    out.repartition(max(1, factor * 2)).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"{name}: {n} rows")
    return n


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-scaled-sf")
    for name in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: copied")
    for name in OFFSET_COLS:
        scale_table(spark, name, factor, out_dir)
    print(f"wrote {out_dir} at factor {factor}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
