"""Independent value references for the rows-only queries (VERDICT r1:
"the 9 rows-only entries are only row-count-checked by the driver —
nothing cross-checks values").

These tests recompute `dedup_near_minhash`, `dedup_simhash`, and
`similarity_topk_lsh` end-to-end OUTSIDE the engine — plain Python
integer/decimal arithmetic over the fixture parquet — and require the
engine's full output rows to match exactly. Spark is used for exactly
one primitive the reference cannot reproduce in pure Python: the
`xxhash64` function itself (seeded, type-tagged). Everything the
engine's pipelines ADD on top of that primitive — shingling,
permutation minima, banding, bucket collisions, Jaccard estimation,
bit votes, band packing, Hamming distances, hyperplane buckets, cosine
rerank — is re-derived independently here.

Rounding parity: Spark's ROUND is HALF_UP on the double; Python's
round() is banker's — the references round via decimal.Decimal with
ROUND_HALF_UP.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

import __spark_entry__ as entrymod
from rdf_mapreduce_joins_spark.operators import dedup
from rdf_mapreduce_joins_spark.operators.dedup import P31, _perm_constants
from rdf_mapreduce_joins_spark.operators.hashing import md5_hex60_py
from rdf_mapreduce_joins_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

NUM_PERM, BANDS, ROWS_PER_BAND = 64, 16, 4
MIN_EST_JACCARD = 0.5
MAX_HAMMING = 8


def _round4(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _docs() -> list[tuple[int, str]]:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _xxhash64_strings(spark, values: list[str]) -> dict[str, int]:
    """Spark's xxhash64 over single string values — the one primitive
    borrowed from the engine (seed + byte layout are Spark-internal)."""
    schema = StructType([StructField("s", StringType())])
    df = spark.createDataFrame([(v,) for v in values], schema=schema)
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    return {r.s: r.h for r in rows}


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return [text]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_minhash_pairs_match_python_reference(spark, family):
    """Both hash families: md5 (the registered, oracled query) gets a
    ZERO-borrowed-primitive hashlib reference; xxhash64 (the operator
    default — the 100 TB family) keeps its reference with exactly the
    base hash borrowed from Spark."""
    docs = _docs()
    all_shingles = sorted({s for _, t in docs for s in _shingles(t)})
    if family == "md5":
        h = {s: md5_hex60_py(s) for s in all_shingles}
    else:
        h = _xxhash64_strings(spark, all_shingles)
    perms = _perm_constants(NUM_PERM)
    # signatures: min over permuted shingle hashes, exact int arithmetic
    sigs: dict[int, list[int]] = {}
    for doc_id, t in docs:
        h0s = [h[s] % P31 for s in _shingles(t)]
        sigs[doc_id] = [min((a * h0 + b) % P31 for h0 in h0s) for a, b in perms]
    if family == "md5":
        # band-bucket key: the exact ':'-joined row values — pure Python
        buckets: dict[tuple[int, str], list[int]] = {}
        for doc_id, sig in sigs.items():
            for b in range(BANDS):
                key = ":".join(
                    str(sig[b * ROWS_PER_BAND + r]) for r in range(ROWS_PER_BAND)
                )
                buckets.setdefault((b, key), []).append(doc_id)
    else:
        # band-bucket hashes: xxhash64(int band, 4 x bigint sig rows) —
        # the multi-arg hash is again the borrowed primitive, fed with
        # the PYTHON-computed signature values.
        schema = StructType(
            [StructField("doc_id", LongType()), StructField("band", IntegerType())]
            + [StructField(f"m{r}", LongType()) for r in range(ROWS_PER_BAND)]
        )
        rows = [
            (doc_id, b, *[sig[b * ROWS_PER_BAND + r] for r in range(ROWS_PER_BAND)])
            for doc_id, sig in sigs.items()
            for b in range(BANDS)
        ]
        bh_df = spark.createDataFrame(rows, schema=schema).select(
            "doc_id",
            "band",
            F.xxhash64(
                F.col("band"), *[F.col(f"m{r}") for r in range(ROWS_PER_BAND)]
            ).alias("bh"),
        )
        buckets = {}
        for r in bh_df.collect():
            buckets.setdefault((r.band, r.bh), []).append(r.doc_id)
    assert all(len(v) <= 10_000 for v in buckets.values())  # cap never binds here
    cand = set()
    for members in buckets.values():
        for i, d1 in enumerate(members):
            for d2 in members[i + 1 :]:
                cand.add((min(d1, d2), max(d1, d2)))
    want = set()
    for d1, d2 in cand:
        eq = sum(1 for x, y in zip(sigs[d1], sigs[d2]) if x == y)
        est = _round4(eq / NUM_PERM)
        if est >= MIN_EST_JACCARD:
            want.add((d1, d2, est))
    if family == "md5":
        out = entrymod.queries()["dedup_near_minhash"](spark, SF)
    else:
        d = load_table(spark, SF, "documents")
        out = dedup.minhash_lsh_pairs(
            dedup.minhash_signatures(d), min_est_jaccard=MIN_EST_JACCARD
        )
    got = {(r.d1, r.d2, float(r.est_jaccard)) for r in out.collect()}
    assert got == want and got


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_simhash_pairs_match_python_reference(spark, family):
    docs = _docs()
    all_toks = sorted({tok for _, t in docs for tok in t.split(" ") if tok != ""})
    if family == "md5":
        # bit j = bit j%4 of hex nibble j//4 — hashlib, no engine
        hexes = {tok: hashlib.md5(tok.encode()).hexdigest() for tok in all_toks}
        h = {
            tok: sum(
                ((int(hx[j // 4], 16) >> (j % 4)) & 1) << j for j in range(64)
            )
            for tok, hx in hexes.items()
        }
    else:
        h = _xxhash64_strings(spark, all_toks)
    # 64 bit votes per doc (token multiplicity = weight), then 4x16-bit
    # band packing — all exact integer arithmetic.
    bands_by_doc: dict[int, list[int]] = {}
    for doc_id, t in docs:
        votes = [0] * 64
        for tok in t.split(" "):
            if tok == "":
                continue
            hv = h[tok]
            for j in range(64):
                votes[j] += 1 if (hv >> j) & 1 else -1
        bands = []
        for b in range(4):
            val = 0
            for j in range(16):
                if votes[b * 16 + j] > 0:
                    val |= 1 << j
            bands.append(val)
        bands_by_doc[doc_id] = bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, bands in bands_by_doc.items():
        for b, bv in enumerate(bands):
            buckets.setdefault((b, bv), []).append(doc_id)
    cand = set()
    for members in buckets.values():
        for i, d1 in enumerate(members):
            for d2 in members[i + 1 :]:
                cand.add((min(d1, d2), max(d1, d2)))
    want = set()
    for d1, d2 in cand:
        ham = sum(
            bin(x ^ y).count("1")
            for x, y in zip(bands_by_doc[d1], bands_by_doc[d2])
        )
        if ham <= MAX_HAMMING:
            want.add((d1, d2, ham))
    if family == "md5":
        out = entrymod.queries()["dedup_simhash"](spark, SF)
    else:
        d = load_table(spark, SF, "documents")
        out = dedup.simhash_pairs(
            dedup.simhash_signatures(d), max_hamming=MAX_HAMMING
        )
    got = {(r.d1, r.d2, r.hamming) for r in out.collect()}
    assert got == want and got


def test_lsh_topk_matches_python_reference(spark):
    from rdf_mapreduce_joins_spark.operators.similarity import hyperplanes

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: [float(x) for x in emb]
        for vid, emb in zip(
            t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
        )
    }
    qv = vecs[0]

    def dot(a, b):
        # sequential left-to-right fold, matching F.aggregate's order
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def bucket(v, planes):
        out = 0
        for j, p in enumerate(planes):
            if dot(v, p) > 0:
                out |= 1 << j
        return out

    tables = [hyperplanes(64, 8, seed=42 + 1000 * t_) for t_ in range(4)]
    qb = [bucket(qv, planes) for planes in tables]
    cands = [
        vid
        for vid, v in vecs.items()
        if vid != 0 and any(bucket(v, planes) == qb[i] for i, planes in enumerate(tables))
    ]

    def cos(a, b):
        return dot(a, b) / ((dot(a, a) ** 0.5) * (dot(b, b) ** 0.5))

    ranked = sorted(
        ((vid, _round4(cos(vecs[vid], qv))) for vid in cands),
        key=lambda p: (-p[1], p[0]),
    )[:10]
    got = [
        (r.vec_id, float(r.sim))
        for r in entrymod.queries()["similarity_topk_lsh"](spark, SF).collect()
    ]
    assert got == ranked and got


def test_lang_id_matches_python_reference(spark):
    """Naive-Bayes lang-id reference: exact integer counts, float
    log-likelihood sums compared at 1e-5 (Java vs glibc log differ at
    ~1 ulp; scores are rounded to 1e-6 by the engine)."""
    import math

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    docs = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    toks_by_doc = {d: [tok for tok in txt.split(" ") if tok != ""] for d, txt, _ in docs}
    lang_by_doc = {d: lang for d, _, lang in docs}
    vocab = {tok for toks in toks_by_doc.values() for tok in toks}
    lang_n: dict[str, int] = {}
    tok_n: dict[tuple[str, str], int] = {}
    for d, toks in toks_by_doc.items():
        lang = lang_by_doc[d]
        for tok in toks:
            lang_n[lang] = lang_n.get(lang, 0) + 1
            tok_n[(lang, tok)] = tok_n.get((lang, tok), 0) + 1
    V = len(vocab)
    want: dict[int, tuple[str, str, float]] = {}
    for d, toks in toks_by_doc.items():
        scores = []
        for lang in sorted(lang_n):
            # add-one smoothing over the FULL token list: unseen
            # tokens contribute ln(1/(lang_n+V)) (the fixed operator
            # semantics — the old inner join dropped them).
            s = 0.0
            for tok in toks:
                c = tok_n.get((lang, tok), 0)
                s += math.log((c + 1) / (lang_n[lang] + V))
            scores.append((round(s, 6), lang))
        best = max(scores, key=lambda p: (p[0], [-ord(c) for c in p[1]]))
        want[d] = (lang_by_doc[d], best[1], best[0])
    got = {
        r.doc_id: (r.lang, r.lang_pred, float(r.score))
        for r in entrymod.queries()["text_lang_id"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], f"doc {d}: true lang differs"
        assert got[d][1] == want[d][1], f"doc {d}: predicted lang differs"
        assert abs(got[d][2] - want[d][2]) < 1e-5, f"doc {d}: score differs"


def _doc_bytes() -> dict[int, bytes]:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return {
        d: txt.encode("utf-8")
        for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }


def test_multimodal_features_match_python_reference(spark):
    """The fake featurizer is sha256-derived; the reference re-derives
    every feature and the query's float32-faithful checksum, verifying
    the Arrow round trip preserves content bytes and batch order has
    no effect."""
    import hashlib

    import numpy as np

    dim = 16
    want = {}
    for d, b in _doc_bytes().items():
        dg = hashlib.sha256(b).digest()
        need = (dim * 2 + len(dg) - 1) // len(dg)
        buf = dg + b"".join(
            hashlib.sha256(b + bytes([i])).digest() for i in range(need)
        )
        feats = [int.from_bytes(buf[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(dim)]
        acc = 0.0
        for v in feats:
            acc += float(np.float32(v))  # stored as array<float>, summed as double
        want[d] = (dim, _round4(acc))
    got = {
        r.id: (r.dim, float(r.feature_sum))
        for r in entrymod.queries()["multimodal_features"](spark, SF).collect()
    }
    assert got == want


def test_multimodal_resize_matches_python_reference(spark):
    import hashlib

    target = 32 * 32
    want = {}
    for d, b in _doc_bytes().items():
        stride = max(1, len(b) // target)
        resized = b[::stride][:target]
        want[d] = (32, 32, hashlib.md5(resized).hexdigest(), len(resized))
    got = {
        r.id: (r.width, r.height, r.resized_md5, r.resized_bytes)
        for r in entrymod.queries()["multimodal_resize"](spark, SF).collect()
    }
    assert got == want


def test_multimodal_frame_sample_matches_python_reference(spark):
    import hashlib

    n_frames = 4
    want = set()
    for d, b in _doc_bytes().items():
        step = max(-(-len(b) // n_frames), 1)  # ceil — frames cover every byte
        for i in range(n_frames):
            frame = b[i * step : i * step + step]
            want.add((d, i, hashlib.md5(frame).hexdigest(), len(frame)))
    got = {
        (r.id, r.frame_no, r.frame_md5, r.frame_n_bytes)
        for r in entrymod.queries()["multimodal_frame_sample"](spark, SF).collect()
    }
    assert got == want


def test_approx_distinct_within_declared_error(spark):
    """agg_approx_distinct is a sketch (HLL++, rsd=0.02) — exact
    equality is undefined by design, but the estimate must sit within
    a conservative multiple of the declared relative error of the true
    per-group distinct count (5 sigma ≈ 10%), and n_rows is exact."""
    from pyspark.sql import functions as F

    got = {
        r.l_returnflag: (r.approx_orders, r.n_rows)
        for r in entrymod.queries()["agg_approx_distinct"](spark, SF).collect()
    }
    exact_df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    exact = {r.l_returnflag: (r.d, r.n) for r in exact_df.collect()}
    assert set(got) == set(exact)
    for k, (approx, n_rows) in got.items():
        d, n = exact[k]
        assert n_rows == n
        assert abs(approx - d) / d <= 0.10, f"{k}: approx {approx} vs exact {d}"


def test_minhash_retain_set_matches_python_reference(spark):
    """End-to-end MinHash deliverable: pairs (already reference-checked
    above) → union-find components → longest-member representative +
    singletons, all re-derived independently."""
    got_pairs = [
        (r.d1, r.d2)
        for r in entrymod.queries()["dedup_near_minhash"](spark, SF).collect()
    ]
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    n_chars = dict(zip(t.column("doc_id").to_pylist(), t.column("n_chars").to_pylist()))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    want = {}
    clustered = set(parent)
    for root, members in comps.items():
        rep = min(members, key=lambda d: (-n_chars[d], d))  # longest, id tiebreak
        want[rep] = root
    for d in n_chars:
        if d not in clustered:
            want[d] = d
    got = {
        r.doc_id: r.component
        for r in entrymod.queries()["dedup_retain_set_minhash"](spark, SF).collect()
    }
    assert got == want


# -- IVF references (round-5: VERDICT r4 #7) -------------------------------
#
# The engine's IVF pair was previously only recall-tested; these
# references re-derive the ENTIRE pipeline — seeded centroid init,
# Lloyd rounds (fold-left float arithmetic in index order, matching
# F.aggregate), nearest-centroid assignment with lowest-cid tiebreak,
# nprobe probe selection, exact cosine rerank with HALF_UP rounding —
# in pure Python and require exact row equality. Float-sum-order
# parity holds because the reference accumulates left-to-right over
# rows in vec_id order, the same order the single-file fixture scan
# feeds Spark's fold/avg at this scale.


def _embeddings() -> list[tuple[int, list[float]]]:
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = list(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    rows.sort(key=lambda r: r[0])
    return [(i, [float(x) for x in v]) for i, v in rows]


def _sq_l2(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _l2(a: list[float]) -> float:
    import math

    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _cosine(a: list[float], b: list[float]) -> float:
    denom = _l2(a) * _l2(b)
    return _dot(a, b) / denom if denom > 0 else 0.0


def _ivf_centroids(
    vecs: list[tuple[int, list[float]]], n_centroids: int = 8, n_iter: int = 2
) -> list[list[float]]:
    centroids = [list(v) for _, v in vecs[:n_centroids]]
    d = len(centroids[0])
    for _ in range(n_iter):
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for _, v in vecs:
            cid = min(
                range(len(centroids)), key=lambda c: (_sq_l2(v, centroids[c]), c)
            )
            s = sums.setdefault(cid, [0.0] * d)
            for i, x in enumerate(v):
                s[i] = s[i] + x
            counts[cid] = counts.get(cid, 0) + 1
        centroids = [
            [sums[c][i] / counts[c] for i in range(d)] if c in counts else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def test_ivf_topk_matches_python_reference(spark):
    """similarity_topk_ivf re-derived end to end in pure Python."""
    vecs = _embeddings()
    centroids = _ivf_centroids(vecs)
    qv = dict(vecs)[0]
    probe = sorted(range(len(centroids)), key=lambda c: (_sq_l2(qv, centroids[c]), c))[:2]
    cand = [
        (i, v)
        for i, v in vecs
        if i != 0
        and min(range(len(centroids)), key=lambda c: (_sq_l2(v, centroids[c]), c))
        in probe
    ]
    scored = sorted(
        ((_round4(_cosine(v, qv)), i) for i, v in cand),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    want = [(i, s) for s, i in scored]
    got = [
        (r.vec_id, r.sim)
        for r in entrymod.queries()["similarity_topk_ivf"](spark, SF).collect()
    ]
    assert got == want


def test_knn_join_ivf_matches_python_reference(spark):
    """similarity_knn_join_ivf re-derived end to end in pure Python."""
    vecs = _embeddings()
    centroids = _ivf_centroids(vecs)
    assign = {
        i: min(range(len(centroids)), key=lambda c: (_sq_l2(v, centroids[c]), c))
        for i, v in vecs
    }
    by_vec = dict(vecs)
    want: set[tuple[int, int, float, int]] = set()
    for qid, qv in vecs:
        if qid % 50 != 0:
            continue
        probe = sorted(
            range(len(centroids)), key=lambda c: (_sq_l2(qv, centroids[c]), c)
        )[:2]
        cand = [
            i for i, cid in assign.items() if cid in probe and i != qid
        ]
        scored = sorted(
            ((_round4(_cosine(by_vec[i], qv)), i) for i in cand),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for rnk, (s, i) in enumerate(scored, start=1):
            want.add((qid, i, s, rnk))
    got = {
        (r.qid, r.vec_id, r.sim, r.rnk)
        for r in entrymod.queries()["similarity_knn_join_ivf"](spark, SF).collect()
    }
    assert got == want
