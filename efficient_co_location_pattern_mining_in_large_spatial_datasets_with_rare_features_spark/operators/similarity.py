"""Similarity search over embedding columns (``array<float>``).

Determinism design: embeddings are quantized to integers
(``round(v * 10000)`` as bigint) before any arithmetic, so dot products are
exact integer sums — bitwise identical in Spark and any ANSI-SQL oracle,
immune to float summation order.  Cosine variants divide two exactly-agreed
numbers, so they also agree bitwise.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline; one
  broadcast of the (small) query set, full scan of the corpus, per-query
  window rank.  Linear in corpus size, embarrassingly parallel.
- ``lsh_topk``: random-hyperplane LSH bucketing (deterministic integer
  planes) — the scale path: only same-bucket candidates are scored.
- ``embedding_duplicates``: near-duplicate pairs by cosine >= threshold,
  LSH-blocked + exactly verified (same contract pattern as dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType
from pyspark.sql.window import Window

QUANT = 10_000


def quantize(col: F.Column) -> F.Column:
    """array<float> -> array<bigint>, v -> round(double(v) * 10000)."""
    return F.transform(
        col, lambda v: F.round(v.cast("double") * QUANT).cast("bigint")
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


@pandas_udf(LongType())
def _pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise exact integer dot product, one numpy einsum per Arrow
    batch.  Replaces the ``_dot`` expression on scoring hot paths:
    Spark's higher-order functions (zip_with/aggregate) run interpreted
    per element with a per-row array allocation — at millions of
    candidate pairs that interpretation dominates the scoring stage,
    while the Arrow round-trip amortizes to a single vectorized matmul
    lane.  Quantized components are <= 10^4 and dims <= a few hundred,
    so products stay far below int64 overflow; numpy int64 arithmetic
    is exact — bit-identical output to ``_dot``.

    Null semantics match ``_dot``: a NULL vector on either side yields
    a NULL dot for that row (the batch still computes — a single null
    embedding must not fail the whole scoring stage).  Contract: all
    non-null vectors in a column share one fixed dimension (quantized
    embeddings of one corpus); ragged dims are a caller bug and raise.
    """
    va, vb = a.to_numpy(), b.to_numpy()
    if len(va) == 0:  # vstack([]) raises; an empty Arrow batch is legal
        return pd.Series(np.empty(0, dtype=np.int64))
    ok = np.array(
        [x is not None and y is not None for x, y in zip(va, vb)], dtype=bool
    )
    if ok.all():
        return pd.Series(
            np.einsum(
                "ij,ij->i", np.vstack(va), np.vstack(vb)
            )
        )
    out = pd.array([None] * len(va), dtype="Int64")
    if ok.any():
        dots = np.einsum("ij,ij->i", np.vstack(va[ok]), np.vstack(vb[ok]))
        out[ok] = dots
    return pd.Series(out)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(_dot(a, a).cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (by quantized cosine) for each query id.

    Output: (query_id, neighbor_id, rank, dot bigint, cosine double);
    self-matches excluded; ties broken by neighbor_id ascending.
    """
    # norms are per-ROW quantities: compute them once per query / corpus
    # row before the pair fan-out (the per-pair variant re-ran a
    # 64-element aggregate 2x per candidate); the pair stage then does
    # one vectorized dot per pair and a scalar divide.
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        quantize(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        quantize(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_dot(F.col("qv"), F.col("cv")).alias("dot"),
            "qn",
            "cn",
        )
        .select(
            "query_id",
            "neighbor_id",
            "dot",
            (F.col("dot").cast("double") / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot", "cosine")
    )


_M64 = (1 << 64) - 1


def _mix(h: int) -> int:
    """splitmix64 finalizer: full-avalanche 64-bit integer mix."""
    h &= _M64
    h ^= h >> 30
    h = (h * 0xBF58476D1CE4E5B9) & _M64
    h ^= h >> 27
    h = (h * 0x94D049BB133111EB) & _M64
    h ^= h >> 31
    return h


#: deterministic integer hyperplanes: component d of plane p is
#: splitmix64(p * 2^32 + d) % 19 - 9 (zero-mean pseudo-random in [-9, 9]).
#: The full-avalanche mix makes every plane distinct (a linear-congruential
#: family used here previously collapsed to p mod 19 — only 19 distinct
#: planes — silently voiding the banded-miss-probability math).
def _plane(p: int, dim: int) -> list[int]:
    return [_mix((p << 32) | d) % 19 - 9 for d in range(dim)]


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    r: int = 8,
    bands: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k via banded hyperplane LSH (OR across ``bands``
    tables of ``r`` planes): score only candidates sharing at least one
    band signature with the query.

    ``multiprobe=True`` (default) additionally probes each query band's r
    single-bit-flip neighbor signatures — the classic multiprobe trick.
    Probing is QUERY-side only (queries are few and broadcast), so the
    corpus bucketing is untouched; per band the match probability rises
    from p^r to p^r + r*p^(r-1)*(1-p), which lifts realized recall several-
    fold on unstructured corpora at the cost of ~(1+r)x more candidates
    per query (still corpus-sublinear).

    Recall < 1 by design — the scale path when a full scan is too
    expensive; bench.py measures realized recall vs cosine_topk every run.
    For a neighbor at cosine s, per-plane agreement p = 1 - acos(s)/pi —
    with the defaults (full-rank distinct planes) recall at s >= 0.8 is
    ~0.996 without multiprobe and > 0.999 with it, degrading on
    unstructured (near-orthogonal) corpora where true top-k neighbors are
    barely closer than random — a data property, not a construction
    defect.  Same output shape as cosine_topk.
    """
    # Signatures come from the vectorized numpy path (one matmul per Arrow
    # batch).  Its quantization rounds half-to-even (np.round); SQL oracles
    # mirror that with roundbankers.  Dot products of integer-valued
    # doubles stay below 2^53, so signs are order-independent and exact on
    # both sides; the scoring dot below uses the engine-wide HALF_UP
    # quantize, shared with cosine_topk.
    #
    # LATE MATERIALIZATION (the load-bearing scale decision): the band
    # explode multiplies every corpus row by ``bands``, and the candidate
    # dedup is a shuffle on (query_id, neighbor_id) — neither may carry
    # the vector payload.  Banding and dedup run over skinny
    # (id, band, sig) rows only (~24 B/row); vectors are re-joined BY ID
    # exactly once, after the candidate set is distinct.  The eager
    # variant (vectors threaded through the explode and the dedup
    # exchange) shuffled ~bands x vector-bytes per corpus row and
    # measured ~10x slower at 100k x 64 dims — identical output.
    sigs = band_signatures(dim, r, bands)

    def _sig_rows(src: DataFrame) -> DataFrame:
        return (
            src.select(
                F.col(id_col).alias("id"), sigs(F.col(vec_col)).alias("sigs")
            )
            .select("id", F.posexplode("sigs"))
            .select("id", F.col("pos").alias("band"), F.col("col").alias("sig"))
        )

    # query rows are filtered BEFORE the signature UDF: the UDF is a
    # nondeterministic-marked fence (see band_signatures), so a filter
    # placed above it would no longer push down — and the corpus side
    # must never compute signatures twice for the query subset's sake
    sig_rows = _sig_rows(embeddings)
    q = _sig_rows(embeddings.filter(F.col(id_col).isin(query_ids))).select(
        F.col("id").alias("query_id"), "band", "sig"
    )
    if multiprobe:
        probes = F.array(
            F.col("sig"),
            *[F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(r)],
        )
        q = q.select("query_id", "band", F.explode(probes).alias("sig"))
    c = sig_rows.select(F.col("id").alias("neighbor_id"), "band", "sig")
    cands = (
        F.broadcast(q)
        .join(c, ["band", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    )
    qvecs = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    scored = (
        cands.join(vecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _pair_dot(F.col("qv"), F.col("cv")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF-style coarse quantizer: the corpus is
    partitioned into ``n_centroids`` cells (each vector assigned to its
    max-dot centroid), and each query scores only the vectors in its
    ``n_probe`` closest cells — the inverted-file pattern that keeps
    per-query work at ~``n_probe/n_centroids`` of a full scan.

    Centroids are the ``n_centroids`` corpus vectors with the smallest
    ids — a deterministic stand-in for an offline-trained k-means codebook
    (at deployment scale the codebook is trained on a sample and
    broadcast; the distributed plumbing — broadcast codebook, map-side
    assignment, cell equi-join — is identical).  Assignment ranks
    centroids by dot product in ONE numpy matmul per Arrow batch (the
    ``band_signatures`` discipline: a per-centroid ``aggregate(zip_with)``
    expression tree is interpreted with no CSE and measured ~10x slower);
    ties break to the lowest centroid index via stable argsort.  The
    assignment-side quantization is numpy's half-to-even (mirrored by SQL
    oracles with ``roundbankers``, exactly as ``lsh_topk`` signatures
    are); candidate SCORING uses the engine-wide HALF_UP ``quantize``
    shared with ``cosine_topk``, so reported dots are identical across
    the exact/LSH/IVF paths.

    Each corpus vector lives in exactly ONE cell, so multi-probe never
    duplicates a candidate — no dedup pass.  Same output shape as
    ``cosine_topk`` minus the cosine column: (query_id, neighbor_id,
    rank, dot).  Recall < 1 by design (a true neighbor may sit in an
    unprobed cell); bench.py measures realized recall vs cosine_topk.
    """
    if n_probe > n_centroids:
        raise ValueError(f"n_probe {n_probe} > n_centroids {n_centroids}")
    cent_rows = (
        embeddings.select(
            F.col(id_col).alias("cid"), quantize(F.col(vec_col)).alias("cv")
        )
        .orderBy("cid")
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([list(r["cv"]) for r in cent_rows], dtype=np.float64)

    @pandas_udf("array<int>")
    def _ranked_cells(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim) float
        qm = np.round(m.astype(np.float64) * QUANT)  # half-to-even
        dots = qm @ cents.T  # (n, C)
        # stable argsort of -dots: equal dots keep ascending centroid index
        order = np.argsort(-dots, axis=1, kind="stable")
        return pd.Series(list(order.astype(np.int32)))

    # same optimizer fence as band_signatures: the query side explodes a
    # slice of this UDF's output, and the Generate-inferred filter would
    # otherwise re-run the assignment matmul in a second ArrowEvalPython
    _ranked_cells = _ranked_cells.asNondeterministic()

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        quantize(F.col(vec_col)).alias("cv"),
        F.element_at(_ranked_cells(F.col(vec_col)), 1).alias("cell"),
    )
    q = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            quantize(F.col(vec_col)).alias("qv"),
            F.explode(
                F.slice(_ranked_cells(F.col(vec_col)), 1, n_probe)
            ).alias("cell"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_dot(F.col("qv"), F.col("cv")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot")
    )


def band_signatures(dim: int, r: int = 12, b: int = 64):
    """Vectorized banded hyperplane signatures: ``array<float> ->
    array<bigint>`` of length ``b`` (one packed r-bit signature per band).

    Same banding construction as minhash-LSH (dedup.py): a pair is a
    candidate iff it matches on ANY band.  Per-plane agreement for cosine s
    is ``p = 1 - acos(s)/pi``; miss probability ``(1 - p^r)^b`` — at the
    near-dup defaults (r=12, b=64): 2e-5 at s=0.90, 8e-10 at s=0.95, while
    two random vectors collide on a band with prob 2^-12, so expected
    random candidates stay ~n*b/2^12 per row instead of n (raise r for
    lower thresholds-of-interest or heavier pruning).

    All r*b plane dot products happen in ONE numpy matmul per Arrow batch —
    a nested-lambda expression tree would re-evaluate the vector per plane
    (no CSE) and is ~100x slower.
    """
    planes = np.array(
        [_plane(p, dim) for p in range(r * b)], dtype=np.float64
    )  # (r*b, dim)
    weights = 1 << np.arange(r, dtype=np.int64)  # pack r bits per band

    @pandas_udf("array<long>")
    def _sigs(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim) float
        q = np.round(m.astype(np.float64) * QUANT)  # quantized, matches _dot
        bits = (q @ planes.T) >= 0  # (n, r*b)
        packed = bits.reshape(len(m), b, r).astype(np.int64) @ weights  # (n, b)
        return pd.Series(list(packed))

    # optimizer fence (pure function, unchanged output): every caller
    # posexplodes the signature array, and InferFiltersFromGenerate
    # otherwise pushes an inferred size>0 filter into a SECOND
    # ArrowEvalPython — the full corpus matmul ran twice per side
    # (round-9 plan audit of lsh_topk / embedding_duplicates).  Callers
    # pre-filter query rows before applying the UDF, so nothing needs to
    # push past it.
    return _sigs.asNondeterministic()


def embedding_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocked: bool = True,
    dim: int = 64,
    r: int = 12,
    b: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by quantized cosine >= threshold (a_id < b_id).

    Default path (``blocked=True``): banded hyperplane LSH candidate
    generation + exact quantized-cosine verification.  The exploded
    signature table carries only (id, band, sig) — never the vectors — so
    the self-join shuffles skinny rows; vectors are fetched back by id for
    the (rare) candidates only.  ``blocked=False`` is the exact all-pairs
    baseline (O(n^2); small inputs / recall measurement only).
    """
    cos = _dot(F.col("av"), F.col("bv")).cast("double") / (
        _norm(F.col("av")) * _norm(F.col("bv"))
    )
    if not blocked:
        a = embeddings.select(
            F.col(id_col).alias("a_id"), quantize(F.col(vec_col)).alias("av")
        )
        bb = embeddings.select(
            F.col(id_col).alias("b_id"), quantize(F.col(vec_col)).alias("bv")
        )
        return (
            a.crossJoin(bb)
            .filter(F.col("a_id") < F.col("b_id"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("a_id", "b_id", "cosine")
        )

    sigs = band_signatures(dim, r, b)
    # persisted because the self-join consumes it as BOTH legs — an
    # unpersisted signature table runs the plane matmul once per leg;
    # the candidate cut is eagerly materialized so the scratch can be
    # released before returning (the dedup.py scratch discipline)
    keyed = embeddings.select(
        F.col(id_col).alias("id"), F.posexplode(sigs(F.col(vec_col)))
    ).select("id", F.col("pos").alias("band"), F.col("col").alias("sig")).persist()
    cand = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    keyed.unpersist()
    av = embeddings.select(
        F.col(id_col).alias("a_id"), quantize(F.col(vec_col)).alias("av")
    )
    bv = embeddings.select(
        F.col(id_col).alias("b_id"), quantize(F.col(vec_col)).alias("bv")
    )
    return (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )
