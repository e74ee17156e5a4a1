"""Deduplication operators for large-scale document corpora.

Four families, all returning deterministic DataFrames:

- exact: md5 of normalized text, hash-groupBy — one shuffle, trivially
  scalable (the 100 TB baseline dedup pass).
- n-gram Jaccard: word-shingle similarity with inverted-index blocking —
  candidate pairs share >= 1 shingle, exact Jaccard verified, so output is
  exactly "all pairs with J >= threshold" (blocking is a pure physical
  optimization: a pair with J > 0 always shares a shingle).
- MinHash + LSH: 128 affine min-hashes over xxhash64 token-shingles, banded
  into buckets; bucket-mates are verified with *exact* Jaccard, so the
  output contract is the same as the n-gram family (LSH only bounds the
  candidate set; at threshold 0.8 with 32x4 banding the miss probability is
  < 1e-7) while scaling to corpora where an inverted index explodes.
- SimHash: 64-bit sign-of-weighted-sum sketch; near-dup = Hamming
  distance <= k, candidates blocked on 16-bit chunks (pigeonhole: any pair
  with <= 3 flipped bits shares an identical chunk).

Embedding near-dup (cosine) lives in similarity.py.
"""

from __future__ import annotations

import os

# module-scope on purpose: pandas_udf resolves its (stringified, thanks to
# `from __future__ import annotations`) type hints against module globals
import pandas as pd  # noqa: F401 — needed by pandas_udf hint resolution
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


# one splitmix64 in the package: MINHASH_SEEDS and minhash_params_hash
# derive from this finalizer, so a second diverging copy would silently
# invalidate every stored band table
from .similarity import _mix as _splitmix64  # noqa: E402


#: affine MinHash seeds h_i(x) = (a_i*x + b_i) mod p.  The a_i MUST be
#: avalanche-mixed, not structured: the original (2i+1, 7i+3) family's
#: band-agreement events were correlated across bands (nearby a_i induce
#: nearly identical argmin orderings of the same shingle set), measured
#: at a 4.5e-4 miss rate for J=0.902 pairs — 11 orders of magnitude off
#: the independent-bands math (found by the 1M-doc bench invariant,
#: round 8; 7 of 24,000 planted pairs missed).  splitmix64-mixed seeds
#: measure 0/20k misses, restoring the documented < 1e-7 bound.  Bounds:
#: a_i < 2^30 and odd (nonzero mod p), x < p < 2^33, so a*x + b < 2^63
#: stays exact in int64 on both the numpy and the Spark-aggregate path.
MINHASH_SEEDS = [
    (_splitmix64(i) % (1 << 30) | 1, _splitmix64(i + (1 << 20)) % MINHASH_PRIME)
    for i in range(128)
]
assert len({a for a, _ in MINHASH_SEEDS}) == 128, "minhash a_i must be distinct"


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs whose normalized text occurs more than once.

    Output: (doc_id, canonical_id = min doc_id of the group, group_size).
    """
    from pyspark.sql.window import Window

    h = docs.select(
        "doc_id", F.md5(T.norm_text(F.col(text_col))).alias("h")
    )
    w = Window.partitionBy("h")
    return (
        h.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "canonical_id", "group_size")
    )


def _small_input(docs: DataFrame) -> bool:
    """True only when the input's Catalyst size estimate is unambiguously
    tiny (< SPARK_GRAFT_DEDUP_SMALL_BYTES, default 4 MiB).

    Gates the dedup scratch materialization choice: corpus-scale scratch
    must be row-checkpointed (the SQL cache's columnar encode costs
    multiples of plain row blocks at 1M docs, and the eager cut gives
    deterministic release points), but each eager checkpoint is its own
    synchronous job, and at 5k docs those barriers cost more than the
    whole lazily-fused pipeline (r09 interleaved bisection: 3.5 s lazy
    persist vs 9.4 s eager checkpoints, identical output).  The estimate
    is coarse — expression-generated frames report ~18 bytes/row — so
    the threshold is deliberately far below any real crossover and any
    estimator failure falls through to the scale-safe checkpoint path.
    """
    # env read per call, not at import: tests force each path by flipping
    # the threshold, and the lookup is nothing next to a Spark job
    thr = int(os.environ.get("SPARK_GRAFT_DEDUP_SMALL_BYTES", str(4 << 20)))
    try:
        est = int(
            docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return False  # unknown size -> scale-safe checkpoint path
    return est < thr


def _spread_skinny(docs: DataFrame) -> DataFrame:
    """Skinny-input rule (see operators/pairs.py): a one-file parquet
    corpus is one partition, and the corpus-wide tokenize/gram/sign
    stage — the expensive map side of every dedup family — would run on
    a single core.  Round-robin repartition is output-invariant here
    (all consumers are per-row ops, joins or aggregates)."""
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parallelism:
        docs = docs.repartition(parallelism)
    return docs


def _shingles(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, distinct word-n-gram array) — [] for short docs.

    Tokens are materialized in their own projection first: composing
    ``word_ngrams(tokens(col))`` as one expression re-evaluates the full
    tokenizer once per n-gram inside the transform lambda (interpreted
    higher-order exprs get no CSE — measured ~10x on this stage).
    """
    toks = docs.select("doc_id", T.tokens(F.col(text_col)).alias("t"))
    if n >= 4:
        # long shingles (decontamination n=13) hit the interpreted-HOF
        # cliff: every gram re-copies n tokens through slice+concat_ws.
        # The Arrow-vectorized twin does the same slicing in one batch
        # pass (~10x at n=13); short grams stay pure-codegen.
        return toks.select(
            "doc_id", T.token_ngrams_vec(n, distinct=True)(F.col("t")).alias("sh")
        )
    return toks.select(
        "doc_id",
        F.array_distinct(T.token_ngrams(F.col("t"), n)).alias("sh"),
    )


def _verified_jaccard_pairs(
    cand: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Join candidate (a,b) id pairs back to shingle sets and keep pairs
    with exact Jaccard >= threshold.  The intersection size is projected
    once (naming it avoids a second array_intersect evaluation inside the
    union term)."""
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    with_inter = (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_sh", "b_sh")).alias("inter"),
            F.size("a_sh").alias("na"),
            F.size("b_sh").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        with_inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _verify_candidates(
    cand: DataFrame,
    docs: DataFrame,
    text_col: str,
    n: int,
    threshold: float,
    dedup_ids: bool = False,
) -> DataFrame:
    """Shared verification tail of the three pair generators (n-gram,
    MinHash, incremental): shingle ONLY candidate docs — the id semi-join
    pushes down into the doc scan, so corpus text is touched for a
    ~10^-2 candidate fraction — then keep pairs with exact word-n-gram
    Jaccard >= threshold.  ``cand`` must already be eagerly cut (each
    caller localCheckpoints its candidate set so this tail cannot replay
    the candidate join).  The shingle frame is persisted because the
    verify join consumes it as BOTH pair sides, and released before
    return (dedup scratch must never outlive its call in the session's
    cache registry — the round-7 leak diagnosis)."""
    ids = (
        cand.select(F.col("a_id").alias("doc_id"))
        .unionByName(cand.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    touched = docs.select("doc_id", text_col).join(ids, "doc_id", "left_semi")
    if dedup_ids:
        # caller passed a corpus that may repeat a doc id (e.g. the
        # incremental base-union-shard overlap); dedup AFTER the semi
        # join so the aggregate runs over candidate docs only — never
        # the full corpus, on any engine, without relying on the
        # optimizer pushing the semi join below a corpus-wide
        # dropDuplicates (round-8 ADVICE)
        touched = touched.dropDuplicates(["doc_id"])
    sh = _shingles(touched, text_col, n).persist()
    out = _verified_jaccard_pairs(cand, sh, threshold).localCheckpoint(eager=True)
    sh.unpersist()
    return out


def ngram_jaccard_duplicates(
    docs: DataFrame, threshold: float = 0.8, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """All doc pairs (a_id < b_id) with word-n-gram Jaccard >= threshold.

    Physical plan: *prefix-filtered* inverted index (AllPairs/PPJoin family)
    then exact verification.  Order every doc's shingles by global document
    frequency ascending (rarest first); two sets with J >= t must share an
    element inside their first ``|sh| - ceil(t*|sh|) + 1`` shingles in that
    order, so blocking on prefixes only is exact while hot shingles ("the
    of"-style n-grams shared by half the corpus) never become join keys —
    that skew otherwise yields O(df^2) candidates from a single shingle.

    Scale shape (round 8, mirroring minhash_lsh_duplicates): the inverted
    index is built over int64 gram HASHES (_gram_hashes — multi-argument
    xxhash64, no gram string materialized), so the two index shuffles
    (df counts, the per-doc rank window) move 8-byte keys instead of
    ~70-byte strings; the global prefix order becomes (df, hash) — any
    deterministic total order shared by both docs keeps the prefix filter
    exact.  String shingles are built only for candidate docs (semi-join)
    for the exact-Jaccard verify; sizes agree between the two bases up to
    2^-64 hash collisions (pinned by
    tests/test_text_dedup.py::test_gram_hash_basis_matches_string_shingles).
    """
    from pyspark.sql.window import Window

    from ._ckpt import unpersist_ckpt

    docs = _spread_skinny(docs)
    # Scratch materialization is size-adaptive (_small_input): at corpus
    # scale, eager localCheckpoint — the SQL cache's columnar encode of
    # these frames costs multiples of the checkpoint's plain row blocks
    # at 1M docs (same A/B as minhash_lsh_duplicates).  At small scale,
    # lazy .persist() — each eager checkpoint is its own synchronous job
    # barrier, and at 5k docs the two barriers cost more than the whole
    # lazily-fused pipeline (r09 bisection: 3.5 s vs 9.4 s warm,
    # identical pairs).
    small = _small_input(docs)
    gh = _gram_hashes(docs, text_col, n)
    gh = gh.persist() if small else gh.localCheckpoint(eager=True)
    inv = gh.select("doc_id", F.size("gh").alias("sz"), F.explode("gh").alias("g"))
    # the df map keeps only grams that occur in >1 doc: a df-1 gram's
    # count is implied (coalesce below), and on any real corpus the
    # unique-gram tail dominates the distinct-gram count — here 740k of
    # 31M distinct grams survive, a 42x smaller join map (at 100 TB the
    # difference is a broadcastable map vs a corpus-scale one)
    df_counts = (
        inv.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") > 1)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("g").asc())
    prefix = (
        # hash-join the df map onto the inverted index (build = counts
        # side): sort-merge sorted both legs before the window's own
        # doc_id sort — r09 interleaved A/Bs, all-clean controls: full
        # map SMJ 6.9-11.1 s -> full map SHJ 5.8-9.3 s -> df>1 map SHJ
        # 5.5-5.8 s for the prefix stage at 1M docs
        inv.join(df_counts.hint("shuffle_hash"), "g", "left")
        .withColumn("df", F.coalesce("df", F.lit(1)))
        .withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .select("doc_id", "sz", "pos", "g")
    )
    # self-joined below: without a materialization the window runs twice
    prefix = prefix.persist() if small else prefix.localCheckpoint(eager=True)
    # Two exact candidate prunes (PPJoin family):
    # - size compatibility: J >= t implies t*|B| <= |A|;
    # - position filter: with both shingle lists in the same global order, a
    #   match at ranks (i, j) bounds the overlap by
    #   min(i,j)-1 + 1 + min(|A|-i, |B|-j), which must reach the J >= t
    #   overlap requirement t*(|A|+|B|)/(1+t).
    overlap_req = F.lit(threshold / (1.0 + threshold)) * (
        F.col("l.sz") + F.col("r.sz")
    )
    overlap_ub = (
        F.least(F.col("l.pos"), F.col("r.pos"))
        + F.least(
            F.col("l.sz") - F.col("l.pos"), F.col("r.sz") - F.col("r.pos")
        )
    )
    cand = (
        prefix.alias("l")
        # hash, not sort-merge: prefix keys are df-ascending (rare by
        # construction), so build-side partitions stay uniform and the
        # two 8M-row sorts are pure overhead (r09 interleaved A/B:
        # 2.1-5.4 s hash vs 3.5-19.8 s sort-merge at 1M docs)
        .join(prefix.alias("r").hint("shuffle_hash"), on="g")
        .filter(
            (F.col("l.doc_id") < F.col("r.doc_id"))
            & (F.col("l.sz") >= F.lit(threshold) * F.col("r.sz"))
            & (F.col("r.sz") >= F.lit(threshold) * F.col("l.sz"))
            & (overlap_ub >= overlap_req)
        )
        .select(
            F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id")
        )
        .distinct()
    )
    # cut so the verify join does not replay the prefix self-join, and so
    # the index scratch can be released NOW.  Eager checkpoint at scale
    # (the barrier is noise next to the 1M self-join, blocks GC-managed,
    # deterministic release).  At small size the checkpoint ALONE costs
    # ~5 s of an ~9 s operator — its LogicalRDD hides cand's tiny size
    # from every verify join and its synchronous job splits the fused
    # pipeline (r09 bisection: persist 3.5 s vs checkpoint 8.9 s warm,
    # only this line varied) — so small mode uses the SQL cache.  The
    # cache entry it pins is candidate pairs from a <4 MiB-estimate
    # input (KBs) — bounded by the same gate, unlike the corpus-scale
    # index caches of the round-7 leak.
    cand = cand.persist() if small else cand.localCheckpoint(eager=True)
    # Scratch release (round-7 diagnosis): scratch left in the registry
    # or block store was a session leak — every call left its index
    # caches pinned forever, and the accumulated storage blocks inflated
    # the *next* memory-hungry operator in a long session 3-5x (bench:
    # 3.75 s isolated vs 20.4 s after a suite prefix, back to 4.4 s
    # after clearCache).  The checkpointed candidate cut is compact
    # (duplicate pairs are O(dup-rate x docs)) and its blocks are
    # GC-managed, not registry-pinned.
    if small:
        gh.unpersist()
        prefix.unpersist()
    else:
        unpersist_ckpt(gh)
        unpersist_ckpt(prefix)
    return _verify_candidates(cand, docs, text_col, n, threshold)


def _gram_hashes(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, distinct int64 token-n-gram hashes) — the minhash input.

    ``xxhash64`` takes the n tokens AS SEPARATE ARGUMENTS, so no gram
    STRING is ever materialized: the string-shingle twin ``_shingles``
    allocates one slice + one concat per gram (~2x the corpus in
    transient strings at 40-token docs, 16 of the 45 s at 1M docs —
    BENCH/profile_minhash_1m.py), and minhash only ever consumes the
    HASH of the gram.  String shingles are still built for the exact-
    Jaccard verify stage, but only for candidate docs (a ~10^-2
    fraction).  Same traps as functions.text.token_ngrams: Spark's
    ``sequence(1, 0)`` descends instead of being empty, so short docs
    get an explicit empty array; tokens are projected first (no CSE in
    interpreted HOFs)."""
    toks = docs.select("doc_id", T.tokens(F.col(text_col)).alias("t"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (n - 1)),
        lambda i: F.xxhash64(
            *[F.element_at(F.col("t"), i + j) for j in range(n)]
        ),
    )
    return toks.select(
        "doc_id",
        F.array_distinct(
            F.when(F.size("t") >= n, grams).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("gh"),
    )


def minhash_signatures(
    docs: DataFrame, n: int = 2, text_col: str = "text", num_hashes: int = 128
) -> DataFrame:
    """(doc_id, sig array<bigint>[num_hashes]) MinHash signatures.

    h_i(x) = (a_i * pmod(xxhash64(gram), p) + b_i) mod p over the
    distinct token-n-gram set.  Empty docs get an empty signature.
    """
    return _minhash_from_gram_hashes(
        _gram_hashes(docs, text_col, n), num_hashes
    )


def _make_sig_fn(num_hashes: int):
    """sig(h) -> (num_hashes,) int64 minhash vector of one doc's gram-hash
    list — THE single definition of the signature math (seed layout, mod-p
    placement, broadcast-min).  ``_minhash_from_gram_hashes`` (the public
    signatures) and ``_band_rows`` (stored band-table keys) both close over
    this, so the two can never silently diverge: a divergence would make a
    stored table probe zero candidates while ``minhash_params_hash`` —
    which only fingerprints the seeds/params, not the formula — still
    matched.  h mod p < 2^33 and a < 2^30, so a*h + b < 2^63 never
    overflows int64 (pinned bit-for-bit by tests/test_text_dedup.py)."""
    import numpy as np

    seeds = MINHASH_SEEDS[:num_hashes]
    a = np.array([s[0] for s in seeds], dtype=np.int64)[:, None]
    b = np.array([s[1] for s in seeds], dtype=np.int64)[:, None]
    p = np.int64(MINHASH_PRIME)

    def sig(h):
        hv = np.asarray(h, dtype=np.int64)[None, :] % p
        return ((a * hv + b) % p).min(axis=1)  # (num_hashes, n) -> mins

    def sig_batch(flat, starts):
        """(num_hashes, n_docs) minhash matrix over MANY docs at once:
        ``flat`` is the concatenated gram-hash array, ``starts`` the
        per-doc segment starts (every segment non-empty).  Identical
        integers to ``sig`` per segment — same (a*h+b) mod p terms, the
        per-doc min taken by ``np.minimum.reduceat`` instead of a
        Python-level loop over docs (the round-8 ``_band_rows`` emit
        loop ran ``sig`` once per doc; at 1M docs the interpreter
        overhead was most of the 8 s signing stage).  In-place ops keep
        one (num_hashes, n_grams) intermediate."""
        hv = np.asarray(flat, dtype=np.int64)[None, :] % p
        m = a * hv
        m += b
        m %= p
        return np.minimum.reduceat(m, starts, axis=1)

    sig.batch = sig_batch
    return sig


def _minhash_from_gram_hashes(gh: DataFrame, num_hashes: int = 128) -> DataFrame:
    """Signatures via one numpy broadcast-min per Arrow batch.

    History of this shape: a nested-transform formulation re-ran the
    whole tokenize->shingle pipeline inside each of the 128 lambda
    branches (~100x, no CSE in interpreted HOFs); the round-2 rewrite
    (explode + 128 plain min aggregates) fixed that but measured 11 s
    at sf0.1 anyway — a 128-buffer HashAggregate exceeds
    spark.sql.codegen.maxFields and runs interpreted, and raising the
    knob did not restore codegen.  Round 5: hash each gram JVM-side
    (xxhash64 stays Spark-specific), then compute all 128 mins as a
    single (num_hashes x n_grams) numpy broadcast per row inside an
    Arrow batch — no shuffle at all (the aggregate's exchange is gone
    too; signatures are per-row).  Round 8: the mod-p reduction moved
    into the batch too (numpy ``%`` matches Spark ``pmod`` for negative
    ints), so the JVM sends raw xxhash64 values.  Exact same integers
    as the aggregate formula: the signature math itself lives in
    ``_make_sig_fn`` (one definition shared with the band-table path)."""
    from pyspark.sql.functions import pandas_udf

    sig = _make_sig_fn(num_hashes)
    empty: list[int] = []

    @pandas_udf("array<bigint>")
    def sig_udf(hs: pd.Series) -> pd.Series:
        def one(h):
            if h is None or len(h) == 0:
                return empty
            return sig(h).tolist()

        return hs.map(one)

    return gh.select("doc_id", sig_udf("gh").alias("sig"))


#: splitmix64 constants for the vectorized band fold (documented basis:
#: bh_B = fold over the band's ``rows`` signature values v_k of
#: h <- mix(h xor (v_k + k*GOLD)), h0 = GOLD, mix = splitmix64 finalizer)
_BF_GOLD = 0x9E3779B97F4A7C15
_BF_M1 = 0xBF58476D1CE4E5B9
_BF_M2 = 0x94D049BB133111EB


def _band_rows(gh: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, bh) LSH band rows — signatures, band fold AND the
    explode in ONE ``mapInPandas`` pass.

    The 128 per-row minhashes never leave the Python worker: the band
    fold (splitmix64 over each band's ``rows`` consecutive signature
    values) runs vectorized on the (bands, rows) matrix right after the
    mins, so the JVM receives 32 skinny int64 band rows per doc instead
    of 128 signatures, and the old JVM-side xxhash-over-slice banding
    pass disappears (was 8 of the 45 s at 1M docs —
    BENCH/profile_minhash_1m.py).  The rows are EMITTED from the worker
    rather than posexplode-d from an array-returning UDF: Catalyst's
    InferFiltersFromGenerate infers ``size(col) > 0`` under a Generate
    and pushes it into a SECOND ArrowEvalPython, silently re-running
    the whole tokenize->gram->sign pipeline per row (measured 54 s vs
    8.5 s for the UDF itself at 1M docs).  Shingle-less docs emit no
    band rows, matching the old explicit size filter.

    ``doc_id`` passes through at its INPUT type (the output schema is
    derived from ``gh``): integral ids take the packed int64 numpy path,
    anything else (string/uuid ids — supported by every sibling operator)
    rides an object array and Arrow casts on the way out."""
    import numpy as np

    rows = num_hashes // bands
    sig_fn = _make_sig_fn(num_hashes)
    id_ddl = gh.schema["doc_id"].dataType.simpleString()
    id_np = (
        np.int64
        if id_ddl in ("bigint", "int", "smallint", "tinyint")
        else object
    )
    m64 = (1 << 64) - 1
    # python-int precompute so no numpy SCALAR multiply can overflow-warn
    k_mul = [np.uint64((k * _BF_GOLD) & m64) for k in range(rows)]
    u30, u27, u31 = np.uint64(30), np.uint64(27), np.uint64(31)
    um1, um2 = np.uint64(_BF_M1), np.uint64(_BF_M2)
    band_idx = np.arange(bands, dtype=np.int32)

    def _mix_vec(x):  # uint64 ndarray: splitmix64 finalizer, wraps mod 2^64
        x = (x ^ (x >> u30)) * um1
        x = (x ^ (x >> u27)) * um2
        return x ^ (x >> u31)

    # docs per signing slice are bounded so the (num_hashes, n_grams)
    # intermediate stays ~16 MB per worker (32 concurrent workers on the
    # bench host); the slice loop is over ~tens of slices per Arrow
    # batch, not per doc
    gram_budget = max(2_000_000 // max(num_hashes, 1), 1024)

    def emit(batches):
        for pdf in batches:
            gh_vals = pdf["gh"].values
            n_in = len(gh_vals)
            if n_in == 0:
                continue
            lens = np.fromiter(
                (0 if h is None else len(h) for h in gh_vals),
                dtype=np.int64,
                count=n_in,
            )
            keep = lens > 0  # shingle-less docs emit no band rows
            nk = int(keep.sum())
            if nk == 0:
                continue
            ids_k = pdf["doc_id"].values[keep]
            if id_np is np.int64:
                ids_k = ids_k.astype(np.int64, copy=False)
            lens_k = lens[keep]
            flat = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h, kp in zip(gh_vals, keep) if kp]
            )
            ends = np.cumsum(lens_k)
            starts = ends - lens_k
            bh_parts = []
            i0 = 0
            while i0 < nk:
                base = int(starts[i0])
                j = int(np.searchsorted(ends, base + gram_budget, side="right"))
                j = max(j, i0 + 1)  # a single huge doc still forms a slice
                # (num_hashes, nd) mins for docs [i0, j) — the shared
                # signature definition, batched (bit-identical to sig())
                sig = sig_fn.batch(
                    flat[base : int(ends[j - 1])], starts[i0:j] - base
                )
                nd = j - i0
                # per-doc (bands, rows) layout == sig.reshape(bands, rows)
                v = sig.T.reshape(nd, bands, rows).astype(np.uint64)
                acc = np.full((nd, bands), np.uint64(_BF_GOLD))
                for k in range(rows):
                    acc = _mix_vec(acc ^ (v[:, :, k] + k_mul[k]))
                bh_parts.append(acc.reshape(-1).view(np.int64))
                i0 = j
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids_k, bands),
                    "band": np.tile(band_idx, nk),
                    "bh": np.concatenate(bh_parts),
                }
            )

    return gh.mapInPandas(emit, f"doc_id {id_ddl}, band int, bh long")


def minhash_params_hash(n: int = 2, num_hashes: int = 128, bands: int = 32) -> int:
    """63-bit fingerprint of everything a stored band table's keys depend
    on: shingle width, hash count, band count, AND the seed family
    itself.  Band keys from mismatched parameters (or a different seed
    family — the round-8 family replacement is exactly such an event)
    share no (band, bh) values, so a stale stored table would silently
    produce ZERO cross-corpus candidates; the fingerprint turns that
    silent miss into a loud error (see ``incremental_duplicates``).

    The trailing ``^ 2`` is the KEY-BASIS version: v2 = token-argument
    xxhash64 grams + in-batch splitmix64 band fold (round 8; v1 was
    string-gram xxhash64 + JVM xxhash-over-slice banding — v1 tables
    fail the probe-time fingerprint check and must be rebuilt)."""
    h = _splitmix64((n << 40) ^ (num_hashes << 20) ^ (bands << 3) ^ 2)
    for a, b in MINHASH_SEEDS[:num_hashes]:
        h = _splitmix64(h ^ a)
        h = _splitmix64(h ^ b)
    return h >> 1  # non-negative int64


def minhash_band_table(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    stamp: bool = True,
) -> DataFrame:
    """Durable LSH index of a corpus: (doc_id, band, bh), one row per
    (doc, band).  This is the "stored signatures" artifact a pipeline
    persists (e.g. as a table bucketed on ``(band, bh)``, the exact
    probe-join key — tests/test_bucketed.py) so future shards can be
    deduplicated against the corpus WITHOUT recomputing its signatures —
    see ``incremental_duplicates``.  Skinny by construction: 32 rows of
    (id, int, int64) per doc regardless of document length.

    With ``stamp=True`` (default) a constant ``sig_v`` column pins the
    parameter/seed-family fingerprint (``minhash_params_hash``) — in
    parquet a constant column RLE-encodes to ~nothing, and probe-time
    validation catches a stored table whose keys were built under
    different parameters before it silently matches no candidates."""
    out = _band_rows(_gram_hashes(docs, text_col, n), num_hashes, bands)
    if stamp:
        out = out.withColumn(
            "sig_v", F.lit(minhash_params_hash(n, num_hashes, bands)).cast("long")
        )
    return out


def minhash_lsh_duplicates(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 2,
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    Output contract (same as ngram_jaccard_duplicates): pairs with exact
    word-n-gram Jaccard >= threshold; LSH is the candidate generator.

    Scale shape (round 8): the corpus-wide pass computes only int64
    gram hashes and band keys (no gram strings, no signature transfer —
    see _gram_hashes/_band_rows); string shingles are built
    SOLELY for candidate docs (a semi-join that pushes the candidate-id
    filter into the scan), mirroring incremental_duplicates.  At 1M
    synthetic docs the operator runs end-to-end in ~21 s (was 45-62 s
    in round 7); the staged attribution is ~4 s gram hashing + ~8 s
    sign+band + ~11 s self-join + ~5 s verify
    (BENCH/profile_minhash_last.json).
    """
    # materialized because the self-join consumes it as BOTH sides: an
    # unmaterialized band table is recomputed once per join leg, i.e. the
    # whole tokenize->gram->sign Python pipeline runs twice.  Eager
    # localCheckpoint, NOT .persist(): the SQL cache stores these 32M
    # skinny rows COLUMNAR-COMPRESSED, and that encode pass measured
    # 35-60 s at 1M docs where the checkpoint's plain row blocks cost
    # ~2 s (round-9 A/B, BENCH/extra_r09.jsonl) — released before
    # returning like all dedup scratch
    from ._ckpt import unpersist_ckpt

    docs = _spread_skinny(docs)
    banded = minhash_band_table(
        docs,
        n=n,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        stamp=False,
    ).localCheckpoint(eager=True)
    # the candidate cut is eagerly materialized: it feeds the id set
    # (twice) and the verify join, and without the cut each consumer
    # would replay the band self-join.  SHUFFLE_HASH on the build leg:
    # sort-merge pays two 32M-row sorts this equi-join does not need —
    # the r09 interleaved A/B measured 2.8-6.4 s (hash) vs 6.6-38 s
    # (sort-merge) at 1M docs.  Build-side partitions are bounded: band
    # keys are near-unique (bucket size tracks near-dup group size), so
    # a partition's hash table is ~rows/shuffle-partitions, uniform.
    cand = (
        banded.alias("l")
        .join(banded.alias("r").hint("shuffle_hash"), on=["band", "bh"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    unpersist_ckpt(banded)
    return _verify_candidates(cand, docs, text_col, n, threshold)


def incremental_duplicates(
    new_docs: DataFrame,
    base_docs: DataFrame,
    base_bands: DataFrame,
    threshold: float = 0.8,
    n: int = 2,
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Near-duplicate pairs involving >= 1 NEW doc, probed against a
    corpus's STORED band table — the incremental-ingest dedup pass.

    ``base_bands`` is ``minhash_band_table(base_docs)`` persisted from a
    prior run (num_hashes/bands must match).  Only the new shard is
    signed and banded; candidates are (a) the within-shard band
    self-join and (b) the probe equi-join of new bands against
    ``base_bands`` on (band, bh).  Band keys are a per-doc function of
    the text, so this candidate set is EXACTLY the from-scratch union
    banding's candidates restricted to pairs with >= 1 new endpoint;
    verification is exact word-n-gram Jaccard, so the output contract
    equals ``minhash_lsh_duplicates(base UNION new)`` restricted the
    same way (tests/test_text_dedup.py pins the equality).

    Scale shape: a STORED ``base_bands`` (parquet/bucketed table) is
    never re-signed; its TEXT is touched only for docs that appear in a
    candidate pair (a semi-join that pushes the candidate-id filter into
    the base scan), so the cost is O(new shard + candidate pairs), not
    O(union).  A base_bands frame passed LAZILY (straight from
    ``minhash_band_table`` without a write) still contains the Python
    sign+band stage in its plan and is consumed by two actions here
    (the sig_v validation agg + the probe join) — such frames are
    auto-persisted for the duration of the call so the base pipeline
    runs once, mirroring the scratch policy of the sibling operators.
    Output: (a_id, b_id, jaccard) with a_id < b_id strictly — a doc
    re-ingested in the new shard under an id already present in the
    base (same id = same doc) never pairs with itself.
    """
    from ._ckpt import unpersist_ckpt

    # lazy-caller guard: materialize iff the plan still computes bands in
    # Python AND the caller has not persisted it already (stored tables
    # are plain scans — materializing those would burn storage for
    # nothing and, at 100 TB, is exactly what a caller must NOT do).
    # Eager localCheckpoint, not .persist(): the SQL cache's columnar
    # encode costs multiples of plain row blocks on skinny band rows
    # (same round-9 A/B as minhash_lsh_duplicates).
    own_ckpt = None
    sl = base_bands.storageLevel
    if not (sl.useMemory or sl.useDisk):
        try:
            computed = "MapInPandas" in (
                base_bands._jdf.queryExecution().optimizedPlan().toString()
            )
        except Exception:  # plan introspection is best-effort only
            computed = False
        if computed:
            own_ckpt = base_bands.localCheckpoint(eager=True)
            base_bands = own_ckpt
    try:
        return _incremental_body(
            new_docs, base_docs, base_bands, threshold, n, text_col,
            num_hashes, bands,
        )
    finally:
        # scratch must not outlive the call even on the validation-error
        # path (round-8 ADVICE: the stale-table ValueError used to exit
        # with the auto-materialized base scratch still pinned)
        if own_ckpt is not None:
            unpersist_ckpt(own_ckpt)


def _incremental_body(
    new_docs: DataFrame,
    base_docs: DataFrame,
    base_bands: DataFrame,
    threshold: float,
    n: int,
    text_col: str,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    from ._ckpt import unpersist_ckpt

    # stored-artifact validation: a band table built under different
    # parameters or a different seed family shares NO (band, bh) values
    # with fresh keys — the probe join would silently return zero cross
    # candidates.  A stamped table (minhash_band_table default) fails
    # loudly here instead; unstamped tables pass through for callers
    # managing versioning externally.
    if "sig_v" in base_bands.columns:
        want = minhash_params_hash(n, num_hashes, bands)
        # min AND max, not a single sampled row: a table appended to
        # across a parameter/seed-family change holds MIXED sig_v eras,
        # and sampling one row would let every stale-era (band, bh) row
        # silently match zero fresh keys.  Bounds come from parquet
        # FOOTER stats when the table is a bare file scan (O(metadata),
        # no data pass — round-9); anything else falls back to the
        # skinny-column partial-agg scan.  Empty tables (both null)
        # pass — nothing to mismatch.
        bounds = _sig_v_bounds_from_footers(base_bands)
        if bounds is None:
            lohi = base_bands.agg(
                F.min("sig_v").alias("lo"), F.max("sig_v").alias("hi")
            ).collect()[0]
            bounds = (lohi["lo"], lohi["hi"])
        stale = [v for v in bounds if v is not None and v != want]
        if stale:
            raise ValueError(
                f"base_bands sig_v {stale[0]} != current parameter/"
                f"seed-family fingerprint {want}: the stored band table "
                "holds rows built under different MinHash parameters (or "
                "an older seed family) and cannot be probed — rebuild it "
                "with minhash_band_table under the current configuration"
            )
        base_bands = base_bands.drop("sig_v")
    # signing the shard is the expensive stage and feeds three join legs
    # (within l/r + cross l): materialize it (eager localCheckpoint, not
    # the columnar SQL cache — same A/B as minhash_lsh_duplicates) and
    # release before returning
    new_bands = minhash_band_table(
        new_docs, n=n, text_col=text_col, num_hashes=num_hashes, bands=bands,
        stamp=False,
    ).localCheckpoint(eager=True)
    within = (
        new_bands.alias("l")
        # same sort-elision as the minhash_lsh_duplicates self-join
        .join(new_bands.alias("r").hint("shuffle_hash"), on=["band", "bh"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id"))
    )
    cross = (
        # build the (small) shard side's hash table and STREAM the stored
        # side: a bucketed stored table still joins exchange-free (the
        # hash distribution requirement is met by the bucket layout,
        # probed at 1 Exchange total in the r09 A/B: 2.0-2.5 s hash vs
        # 2.5-14.6 s sort-merge, which paid a shard-side sort)
        new_bands.alias("l").hint("shuffle_hash")
        .join(base_bands.alias("r"), on=["band", "bh"])
        # a shard doc whose id already exists in the base (re-ingest)
        # band-matches ITSELF in every band: least/greatest folds that to
        # a degenerate (x, x) row, excluded here so the a_id < b_id
        # output contract holds even on overlapping inputs
        .filter(F.col("l.doc_id") != F.col("r.doc_id"))
        .select(
            F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("a_id"),
            F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("b_id"),
        )
    )
    # eagerly cut so the band plans are not replayed once per verify
    # consumer (the shared tail joins cand three ways); the cut also
    # guarantees the shard-band blocks can be released NOW even if a
    # later stage throws
    try:
        cand = within.unionByName(cross).distinct().localCheckpoint(eager=True)
    finally:
        unpersist_ckpt(new_bands)
    # verify against the union corpus, shingling each overlap doc ONCE:
    # the same id appearing in both inputs (same id = same doc) must not
    # fan out every pair that touches it in the verify join.  The union
    # is passed UNdeduplicated and ``dedup_ids=True`` dedups AFTER the
    # candidate semi-join inside _verify_candidates — O(candidate docs)
    # on any engine, instead of a corpus-wide dropDuplicates whose
    # documented O(shard) cost depended on Catalyst pushing the semi
    # join below the aggregate (round-8 ADVICE).
    touched = new_docs.select("doc_id", text_col).unionByName(
        base_docs.select("doc_id", text_col)
    )
    return _verify_candidates(cand, touched, text_col, n, threshold, dedup_ids=True)


def _sig_v_bounds_from_footers(df: DataFrame) -> tuple | None:
    """(min, max) of ``sig_v`` from parquet FOOTER statistics — the
    O(metadata) form of the staleness bound (round-8 verdict: the
    full-column min/max agg is a per-ingest pass over the whole stored
    band table; at 100 TB that is hours of scan for two numbers the
    writer already recorded in every footer).

    Returns None — caller falls back to the agg — unless the frame is a
    bare file-source scan (optionally column-pruned) whose every row
    group carries complete non-null ``sig_v`` stats: a FILTERED frame
    must not be judged by whole-file bounds (rows outside the filter
    could hold the only stale era), and missing/empty stats prove
    nothing.  ``(None, None)`` = provably empty table (0 rows), which
    validation passes like the agg's all-null result."""
    import re

    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if not all(
            re.match(r"^[\s+:\-]*(Project|Relation)", ln)
            for ln in plan.splitlines()
            if ln.strip()
        ):
            return None
        files = df.inputFiles()
        if not files or not all(f.endswith(".parquet") for f in files):
            return None
        # pyarrow reads each footer natively in one call — a py4j walk
        # over blocks/columns was measured at ~1 s per file in driver
        # round-trips, defeating the point.  Local files only; remote
        # schemes fall back to the (always-correct) agg.
        import pyarrow.parquet as pq

        lo = hi = None
        n_rows = 0
        for f in files:
            if f.startswith("file:"):
                f = f[5:]
                while f.startswith("//"):
                    f = f[1:]
            elif "://" in f:
                return None
            md = pq.ParquetFile(f).metadata
            try:
                ci = md.schema.names.index("sig_v")
            except ValueError:
                return None
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                if rg.num_rows == 0:
                    continue
                n_rows += rg.num_rows
                st = rg.column(ci).statistics
                if (
                    st is None
                    or not st.has_min_max
                    or st.null_count is None
                    or st.null_count > 0
                ):
                    return None  # stats absent/partial: prove nothing
                lo = st.min if lo is None or st.min < lo else lo
                hi = st.max if hi is None or st.max > hi else hi
        return (lo, hi) if n_rows else (None, None)
    except Exception:  # missing files/API drift: the agg path is always correct
        return None


def dedup_incremental(
    base_membership: DataFrame,
    new_docs: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    validate_snapshot: bool = True,
) -> DataFrame:
    """Fold a new shard into an existing dedup verdict WITHOUT re-running
    connected components over the union's duplicate graph.

    Inputs: ``base_membership`` is a prior ``dedup_membership`` snapshot
    (min-id policy) over the base corpus; ``new_pairs`` is every
    duplicate pair with >= 1 new endpoint (``incremental_duplicates``).
    Returns the UNION verdict — identical, row for row, to
    ``dedup_membership(base UNION new, base_pairs UNION new_pairs)``
    (pinned by tests/test_text_dedup.py and the driver's
    ``dedup_incremental`` recursive-closure oracle).

    How it stays incremental: every base duplicate GROUP enters the
    contraction as one super-node labeled by its group_id (= min member
    id), so the contracted graph has O(new docs + base groups touched by
    a new pair) nodes — never O(base corpus).  Min-id labels compose
    exactly: min over a merged component of {base group labels, new doc
    ids} IS the min doc id of the union component, because each base
    label is already the min of its members.  Verdicts for base groups
    no new pair touches are passed through unchanged (zero recompute).

    Precondition: the snapshot must be MIN-ID policy (the default) — the
    fold relabels with component-min ids, so a quality-policy snapshot
    (``score_col``) would silently have its representatives flipped back
    to min-id.  ``validate_snapshot=True`` (default) fails loudly on
    such a snapshot with one column-pruned aggregate (kept must equal
    ``id == group_id`` on every row); pass False only when the snapshot
    provably came from the default policy and the extra scan matters.
    """
    if validate_snapshot:
        bad = base_membership.filter(
            F.col("kept") != (F.col(id_col) == F.col("group_id"))
        ).count()
        if bad:
            raise ValueError(
                f"base_membership is not a min-id-policy snapshot ({bad} rows "
                "have kept != (id == group_id)) — quality-policy (score_col) "
                "snapshots cannot be folded incrementally: the fold relabels "
                "with component-min ids and would silently flip the "
                "representatives back to min-id"
            )
    base_map = base_membership.select(
        F.col(id_col).alias("_m_id"), F.col("group_id").alias("_m_grp")
    )
    # rewrite pair endpoints: base doc -> its base group super-node; new
    # docs pass through (new ids never collide with base group ids — a
    # group id is a base doc id and the corpora are disjoint)
    e = (
        new_pairs.select(F.col(a_col).alias("_ea"), F.col(b_col).alias("_eb"))
        .join(
            base_map.select(
                F.col("_m_id").alias("_ea"), F.col("_m_grp").alias("_ga")
            ),
            "_ea",
            "left",
        )
        .join(
            base_map.select(
                F.col("_m_id").alias("_eb"), F.col("_m_grp").alias("_gb")
            ),
            "_eb",
            "left",
        )
        .select(
            F.coalesce("_ga", "_ea").alias("_u0"),
            F.coalesce("_gb", "_eb").alias("_v0"),
        )
    )
    edges = (
        e.select(
            F.least("_u0", "_v0").alias("u"), F.greatest("_u0", "_v0").alias("v")
        )
        # both endpoints inside one base group: already recorded, no-op
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    from .cluster import _contract_components

    comp = _contract_components(edges).persist()  # (node, label)
    # component sizes: base super-node weight = its group size (kept row's
    # n_dropped + 1 — every base group has exactly one kept row), new doc
    # weight = 1
    base_sizes = base_membership.filter("kept").select(
        F.col("group_id").alias("node"),
        (F.col("n_dropped") + F.lit(1)).cast("long").alias("_bsz"),
    )
    weighted = comp.join(base_sizes, "node", "left").select(
        "node",
        "label",
        F.coalesce("_bsz", F.lit(1)).cast("long").alias("_w"),
        F.col("_bsz").isNotNull().alias("_is_base"),
    )
    comp_sz = weighted.groupBy("label").agg(F.sum("_w").alias("_tot"))

    # --- base rows: relabel members of touched groups; pass the rest through
    touched = weighted.filter("_is_base").select(
        F.col("node").alias("_old_g"), F.col("label").alias("_new_g")
    )
    bm = base_membership.join(
        touched, base_membership["group_id"] == touched["_old_g"], "left"
    ).join(comp_sz, F.col("_new_g") == comp_sz["label"], "left")
    new_grp = F.coalesce("_new_g", "group_id")
    kept_b = F.col(id_col) == new_grp
    base_rows = bm.select(
        F.col(id_col),
        new_grp.alias("group_id"),
        kept_b.alias("kept"),
        F.when(
            kept_b,
            F.coalesce(F.col("_tot") - F.lit(1), F.col("n_dropped")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_dropped"),
    )

    # --- new rows: label from the contraction; singletons keep themselves
    nd = new_docs.select(F.col(id_col)).join(
        comp.select(F.col("node").alias(id_col), "label"), id_col, "left"
    ).join(comp_sz.withColumnRenamed("label", "_cl"), F.col("label") == F.col("_cl"), "left")
    grp_n = F.coalesce("label", F.col(id_col))
    kept_n = F.col(id_col) == grp_n
    new_rows = nd.select(
        F.col(id_col),
        grp_n.alias("group_id"),
        kept_n.alias("kept"),
        F.when(kept_n, F.coalesce(F.col("_tot") - F.lit(1), F.lit(0)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_dropped"),
    )
    out = base_rows.unionByName(new_rows).localCheckpoint(eager=True)
    comp.unpersist()
    return out


#: bits in the SQL-portable token hash (15 hex digits of md5 -> 60 bits);
#: both Spark (conv) and ANSI engines (hex cast) produce the identical int64.
SIMHASH_BITS = 60


def token_hash60(tok: F.Column) -> F.Column:
    """60-bit token hash = int(md5(tok)[0:15], 16) — chosen over xxhash64
    because every SQL engine can reproduce it, making simhash oracle-
    checkable end-to-end."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


#: packed-lane aggregation: 3 bit-counters of 21 bits each per 64-bit sum,
#: so the per-doc popcounts need ceil(60/3)=20 aggregates (+1 count) with
#: 21-bit lanes supporting documents up to 2^21 tokens, instead of 60
#: single-purpose sums — narrower partial-agg rows in the shuffle and
#: ~13% faster signature stage at sf0.1, bit-identical output.
_SIMHASH_LANE = 21
_SIMHASH_LANES_PER_AGG = 3


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash bigint): SIMHASH_BITS sign-of-sum sketch — bit j is
    1 iff more token hashes have bit j set than not (strictly: ties give
    0, matching the previous ±1-sum formulation since 2*pop > n iff the
    signed sum is positive)."""
    lane, lpg = _SIMHASH_LANE, _SIMHASH_LANES_PER_AGG
    ngroups = -(-SIMHASH_BITS // lpg)
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", token_hash60(F.col("tok")))
    packed = []
    for g in range(ngroups):
        js = [g * lpg + li for li in range(lpg) if g * lpg + li < SIMHASH_BITS]
        expr = None
        for li, j in enumerate(js):
            bit = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)).cast("bigint")
            term = bit if li == 0 else bit * F.lit(1 << (lane * li)).cast("bigint")
            expr = term if expr is None else expr + term
        packed.append(F.sum(expr).alias(f"g{g}"))
    agg = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *packed)
    mask = (1 << lane) - 1
    sig = None
    for g in range(ngroups):
        js = [g * lpg + li for li in range(lpg) if g * lpg + li < SIMHASH_BITS]
        for li, j in enumerate(js):
            pop = F.shiftrightunsigned(F.col(f"g{g}"), lane * li).bitwiseAND(
                F.lit(mask)
            )
            bit = (
                F.when(pop * 2 > F.col("n"), F.lit(1 << j).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            )
            sig = bit if sig is None else sig + bit
    # a lane is a saturating-free 21-bit counter: a document with >= 2^21
    # tokens would silently carry into the adjacent lane, so fail loudly
    # instead of corrupting signatures (one comparison per doc, not token)
    lane_cap = 1 << lane
    guarded = F.when(F.col("n") < F.lit(lane_cap), sig).otherwise(
        F.raise_error(
            F.concat(
                F.lit("simhash packed-lane overflow: doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(f" has >= {lane_cap} tokens (lane width {lane} bits)"),
            )
        ).cast("bigint")
    )
    return agg.select("doc_id", guarded.alias("simhash"))


def hamming_near_duplicates(
    sigs: DataFrame,
    hamming_max: int,
    bits: int,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Pairs whose ``bits``-wide integer signatures differ in at most
    ``hamming_max`` bit positions — the shared scale core behind simhash
    text dedup and phash image dedup.

    Blocking: split the signature into hamming_max+1 disjoint chunks that
    cover all ``bits`` (the last chunk absorbs the remainder); by
    pigeonhole two signatures within the distance share at least one exact
    chunk, so the equi-join on (chunk_index, chunk_value) is lossless.
    Candidates are verified with the exact popcount, so the result is
    exact, never approximate.
    """
    if hamming_max < 0:
        raise ValueError(f"hamming_max must be >= 0, got {hamming_max}")
    nchunks = hamming_max + 1
    if nchunks > bits:
        raise ValueError(f"hamming_max {hamming_max} too large for {bits}-bit sigs")
    width = bits // nchunks

    def chunk(i: int) -> F.Column:
        lo = i * width
        w = bits - lo if i == nchunks - 1 else width
        return (
            F.shiftrightunsigned(F.col(sig_col), lo)
            .bitwiseAND(F.lit((1 << w) - 1) if w < 64 else F.lit(-1))
            .alias("cv")
        )

    chunks = sigs.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias(sig_col),
        F.explode(
            F.array(
                *[F.struct(F.lit(i).alias("ci"), chunk(i)) for i in range(nchunks)]
            )
        ).alias("c"),
    ).select("_id", sig_col, "c.ci", "c.cv")
    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"), on=["ci", "cv"])
        .filter(F.col("l._id") < F.col("r._id"))
        .select(
            F.col("l._id").alias("a_id"),
            F.col("r._id").alias("b_id"),
            F.col(f"l.{sig_col}").alias("a_sig"),
            F.col(f"r.{sig_col}").alias("b_sig"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
    return cand.filter(ham <= hamming_max).select(
        "a_id", "b_id", ham.alias("hamming")
    )


def simhash_duplicates(
    docs: DataFrame, hamming_max: int = 3, text_col: str = "text"
) -> DataFrame:
    """Pairs with simhash Hamming distance <= hamming_max (exact — chunk
    blocking plus popcount verification; see hamming_near_duplicates)."""
    sigs = simhash(_spread_skinny(docs), text_col)
    return hamming_near_duplicates(
        sigs, hamming_max, SIMHASH_BITS, id_col="doc_id", sig_col="simhash"
    )


def phash_duplicates(images: DataFrame, hamming_max: int = 8) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    ``images`` is the image table (sources/image_table.py shape) whose
    64-bit ``phash`` column was computed over *decoded* pixels, so
    re-encoded/recompressed variants of one image land within a few bits
    of each other while distinct images differ in ~32.  Same pigeonhole
    blocking as simhash — bytes never move, only (id, 8-byte sig) rows.
    """
    return hamming_near_duplicates(
        images.select("image_id", "phash"),
        hamming_max,
        64,
        id_col="image_id",
        sig_col="phash",
    )


def duplicate_groups(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """Canonicalize duplicate PAIRS into GROUPS: connected components over
    the duplicate graph, labeled by the minimum doc id of each component.

    Pairwise dedup output is not directly actionable — keeping "one of
    each pair" can still keep two docs that are duplicates transitively
    (A~B, B~C).  The group id picks one deterministic representative per
    component; a pipeline keeps ``doc_id == group_id`` rows and drops the
    rest.  Reuses the star-contraction + driver-finish component machinery
    from cluster.py (O(log n) rounds at any scale).

    Output: (doc_id, group_id) for every doc appearing in >= 1 pair with a
    DIFFERENT doc.  Degenerate self-pairs (a == b) carry no duplication
    information and are dropped; a doc absent from the output has no
    duplicates.
    """
    from .cluster import _contract_components

    edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return _contract_components(edges).select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_id")
    )


def dedup_membership(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str | None = None,
    both_policies: bool = False,
) -> DataFrame:
    """Full-corpus dedup verdict: one row per input doc with its duplicate
    group and the keep/drop decision a pipeline acts on.

    Output columns:

    - ``id_col``: the doc id;
    - ``group_id``: connected-component label of the duplicate graph
      (min id of the component; a doc with no duplicates is its own group);
    - ``kept``: true iff this doc is its group's representative —
      the row the deduplicated corpus retains;
    - ``n_dropped``: for kept rows, how many other docs collapsed into
      this representative (0 for unique docs); always 0 for dropped rows.

    Representative policy: min id by default.  With ``score_col`` the
    representative is the group member with the HIGHEST score (min id
    tie-break) — the policy real training-data pipelines run, keeping
    the longest / highest-quality member of a near-dup cluster rather
    than an arbitrary one.  ``docs`` must then carry ``score_col``.
    With ``both_policies=True`` (requires ``score_col``) the min-id
    verdict fills ``kept``/``n_dropped`` and the quality verdict is
    appended as ``kept_q``/``n_dropped_q`` — one connected-components
    pass serves both (the expensive part is the iterative contraction,
    not the verdicts).

    Scale shape: ``duplicate_groups`` is O(log n) star-contraction rounds;
    the membership join is one broadcast-or-shuffle hash join on the doc
    id (group output is bounded by docs appearing in >= 1 duplicate pair,
    typically a small fraction of the corpus).  The quality policy adds
    one ``max(struct)`` per group — planned as a partial SortAggregate
    (struct buffers don't hash-aggregate) so it is still map-side
    combined before the group shuffle; no per-row Window over the
    corpus, and the sort touches only the (small) grouped rows.
    """
    if both_policies and score_col is None:
        raise ValueError("both_policies=True requires score_col")
    if score_col is not None:
        from pyspark.sql.types import NumericType

        # the quality tie-break negates the id inside max(struct); a string
        # id would implicitly cast to NULL (non-ANSI) and silently turn
        # "min id" into "arbitrary" — fail loudly at plan time instead
        id_type = docs.schema[id_col].dataType
        if not isinstance(id_type, NumericType):
            raise ValueError(
                f"quality policy (score_col={score_col!r}) requires a numeric "
                f"{id_col} for the min-id tie-break; got {id_type.simpleString()}"
            )
    groups = duplicate_groups(pairs).withColumnRenamed("doc_id", id_col)
    sizes = groups.groupBy("group_id").agg(
        (F.count("*") - F.lit(1)).cast("long").alias("_grp_extra")
    )
    g = groups.join(sizes, "group_id")
    kept_min = F.col("group_id").isNull() | (F.col(id_col) == F.col("group_id"))
    if score_col is not None:
        # argmax(score, tie-break min id) per component: max over
        # (score, -id) structs — a partial-aggregable one-pass reduce,
        # deterministic for any score type with total ordering
        reps = (
            groups.join(docs.select(id_col, score_col), id_col)
            .groupBy("group_id")
            .agg(
                F.max(
                    F.struct(
                        F.col(score_col).alias("_s"),
                        (-F.col(id_col)).alias("_nid"),
                    )
                ).alias("_best")
            )
            .select("group_id", (-F.col("_best._nid")).alias("_rep_id"))
        )
        g = g.join(reps, "group_id")
        kept_qual = F.col("group_id").isNull() | (F.col(id_col) == F.col("_rep_id"))
    kept = kept_min if score_col is None or both_policies else kept_qual

    def _verdict(k, name_kept, name_drop):
        return [
            k.alias(name_kept),
            F.when(k, F.coalesce("_grp_extra", F.lit(0)))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(name_drop),
        ]

    cols = [
        F.col(id_col),
        F.coalesce("group_id", F.col(id_col)).alias("group_id"),
        *_verdict(kept, "kept", "n_dropped"),
    ]
    if both_policies:
        cols += _verdict(kept_qual, "kept_q", "n_dropped_q")
    return docs.select(id_col).join(g, id_col, "left").select(*cols)


def apply_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str | None = None,
) -> DataFrame:
    """Materialize the DEDUPLICATED corpus — the action a pipeline user
    actually runs over pairwise dedup output (round-5 verdict #2): keep
    each duplicate group's representative (min id by default, or
    highest-``score_col`` with min-id tie-break — transitively closed, so
    A~B, B~C collapses all three even when A,C were never a pair) plus
    every doc with no duplicates.

    Returns ``docs``' full rows for survivors with one extra ``n_dropped``
    column (how many duplicates this row absorbed).  One hash join against
    the (small) membership table on top of the component machinery.
    """
    m = dedup_membership(docs, pairs, id_col=id_col, score_col=score_col).filter(
        "kept"
    )
    return docs.join(
        m.select(id_col, "n_dropped"), id_col, "inner"
    )
