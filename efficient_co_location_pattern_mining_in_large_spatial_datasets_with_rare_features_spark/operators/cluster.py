"""Density-based spatial clustering (DBSCAN) on the neighbor-pair grid.

The reference mines co-locations over the ε-neighbor graph (src/
spatial_index.cpp:43-114); this operator reuses the same grid equi-join to
answer the other classic question over that graph — density clusters.

Semantics (classic DBSCAN, deterministic tie-breaks):

- *core*:   |N_eps(p)| >= min_pts, counting p itself;
- *border*: non-core with at least one core ε-neighbor;
- *noise*:  everything else (cluster NULL).
- cluster label = the MINIMUM instance id among the cluster's core points
  (density-connectivity over core-core ε-edges), so labels are stable
  across runs, partitionings and engines.  A border point adjacent to
  several clusters takes the minimum label (deterministic, unlike the
  scan-order-dependent assignment of the original sequential algorithm).

Physical plan (Spark-first):

1. ε-pairs from the grid-cell stencil join (pairs.neighbor_pairs with the
   feature filter off) — never an all-pairs product;
2. degree count -> core flag (one shuffle);
3. connected components over core-core edges by *star contraction* with
   in-round pointer doubling (O(log n) rounds even on path graphs); each
   round shuffles only the shrinking edge set plus a constant-width label
   map.  Lineage AND stats are cut per round via ``_cut`` (plain
   localCheckpoint compounds size estimates — see its docstring).  Once
   the contracted graph drops below ``driver_finish_edges`` the remainder
   finishes with driver-side union-find, mirroring the miner's driver-side
   candidate bookkeeping (plans/miner.py).
4. border assignment = one broadcast-or-hash join of non-core points'
   core neighbors against the label map.

The oracle mirrors this with a recursive transitive closure, which is
exponential-ish in component size — fine at correctness scale, which is
exactly why the engine side uses contraction instead.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from ._ckpt import unpersist_ckpt
from .pairs import neighbor_pairs

_MAX_ROUNDS = 64

#: contracted graphs at or below this edge count finish on the driver with
#: linear-time union-find — the same driver-finish discipline as the miner's
#: candidate bookkeeping: a bounded remainder beats a tail of tiny serial
#: distributed rounds.  Round 3 raised this to 1M claiming -13% on the
#: sf0.1 ε-graph, but the within-session per-leg-JVM A/B
#: (BENCH/dbscan_ab.py, best-of-2: 500k 9.51 s vs 1M 9.74 s) shows the
#: raise does NOT reproduce — pushing 563k edges through toLocalIterator
#: into single-threaded Python union-find costs what the skipped
#: distributed round saved.  500k keeps the smaller driver envelope.
_DRIVER_FINISH_EDGES = 500_000


def _cut(
    df: DataFrame, graveyard: list[tuple[DataFrame, DataFrame]] | None = None
) -> DataFrame:
    """Materialize ``df`` and rebuild it as a fresh leaf scan.

    ``localCheckpoint`` truncates the RDD lineage but *carries the origin
    plan's estimated stats*, and Spark's size-only join estimator multiplies
    child sizes — so iterative self-joins of checkpoints compound
    ``sizeInBytes`` into BigInts whose bit width doubles per round; by round
    ~10 the driver spends minutes just multiplying them (observed: 100 s of
    BigInteger.multiplyToomCook3 to plan a 37-edge join).  Re-wrapping the
    checkpointed RDD as a bare scan resets the estimate to the default;
    AQE's runtime re-planning still uses the REAL materialized sizes, so
    broadcast-vs-shuffle decisions are unaffected.

    ``graveyard`` (optional) records ``(wrapped, ck)`` so the caller can
    eagerly release dead generations with ``_free_except`` instead of
    waiting for nondeterministic ContextCleaner GC."""
    ck = df.localCheckpoint()
    try:
        jdf = df.sparkSession._jsparkSession.internalCreateDataFrame(
            ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False
        )
        wrapped = DataFrame(jdf, df.sparkSession)
    except Exception as e:  # private API moved: degrade to the plain checkpoint
        # visible degradation: plain localCheckpoint reinstates the
        # compounding sizeInBytes estimate this function exists to avoid
        # (100s-per-round planning stalls on deep iteration)
        warnings.warn(
            f"_cut fell back to plain localCheckpoint ({type(e).__name__}: {e}); "
            "iterative planning may slow down on deep contractions",
            stacklevel=2,
        )
        wrapped = ck
    if graveyard is not None:
        graveyard.append((wrapped, ck))
    return wrapped


def _free_except(
    graveyard: list[tuple[DataFrame, DataFrame]], keep: tuple[DataFrame, ...]
) -> None:
    """Release every graveyard checkpoint whose wrapped frame is not in
    ``keep``.  Safe only when every non-kept frame is provably dead (its
    data consumed into newer eager checkpoints / driver state)."""
    keep_ids = {id(k) for k in keep}
    still: list[tuple[DataFrame, DataFrame]] = []
    for wrapped, ck in graveyard:
        if id(wrapped) in keep_ids:
            still.append((wrapped, ck))
        else:
            unpersist_ckpt(ck)
    graveyard[:] = still


def _driver_finish(cur: DataFrame, mapping: DataFrame) -> DataFrame:
    """Union-find the contracted remainder on the driver (min id becomes
    the root), then fold the roots back into ``mapping`` with one broadcast
    join.  Works for any orderable id type (the fin frame inherits the
    edge columns' datatype)."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    seen: set = set()
    for u, v in cur.select("u", "v").toLocalIterator():
        seen.add(u)
        seen.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    id_type = cur.schema["u"].dataType
    fin = cur.sparkSession.createDataFrame(
        [(x, find(x)) for x in seen],
        StructType(
            [StructField("s", id_type, False), StructField("lab", id_type, False)]
        ),
    )
    return (
        mapping.join(
            F.broadcast(fin.select(F.col("s").alias("label"), F.col("lab").alias("_new"))),
            "label",
            "left",
        )
        .select("node", F.coalesce("_new", "label").alias("label"))
    )


def _contract_components(
    edges: DataFrame,
    driver_finish_edges: int = _DRIVER_FINISH_EDGES,
    graveyard: list[tuple[DataFrame, DataFrame]] | None = None,
) -> DataFrame:
    """Connected components of an undirected graph given as canonical
    (u, v) edges (u < v).  Returns (node, label) for every node that
    appears in at least one edge; label = min node id in the component.

    Non-numeric node ids are xxhash64-int-encoded before contraction (the
    same discipline as the miner's edge table, plans/miner.py): every
    round's shuffle and the driver-finish union-find then move 8-byte
    longs instead of arbitrary-width strings (~4x less driver memory on
    doc-id graphs).  The encoding is checked injective first (one
    aggregate over the node set) with a transparent fallback to raw ids;
    the final label is re-derived as min ORIGINAL id per component, so
    the output contract is identical either way."""
    # Cut the edges FIRST: nodes/mapping then derive from the materialized
    # scan instead of re-running the (possibly expensive) upstream pipeline
    # a second time.
    # local working list; `graveyard` is export-only (see _contract_raw):
    # checkpoints still live at return — the result plan's leaves — are
    # appended so the caller can free them after materializing the result
    grave: list[tuple[DataFrame, DataFrame]] = []
    cur = _cut(edges, grave)
    if not isinstance(cur.schema["u"].dataType, NumericType):
        nodes = _cut(
            cur.select(F.col("u").alias("node"))
            .unionByName(cur.select(F.col("v").alias("node")))
            .distinct()
            .select("node", F.xxhash64("node").alias("h")),
            grave,
        )
        stats = nodes.agg(
            F.count("*").alias("n"), F.countDistinct("h").alias("nh")
        ).collect()[0]
        if stats["n"] == stats["nh"]:
            int_edges = (
                cur.join(nodes.select(F.col("node").alias("u"), F.col("h").alias("hu")), "u")
                .join(nodes.select(F.col("node").alias("v"), F.col("h").alias("hv")), "v")
                .select(
                    F.least("hu", "hv").alias("u"),
                    F.greatest("hu", "hv").alias("v"),
                )
            )
            exported: list[tuple[DataFrame, DataFrame]] = []
            comp = _contract_raw(
                _cut(int_edges, grave), driver_finish_edges, graveyard=exported
            )
            # comp's plan references only _contract_raw's still-live
            # checkpoints (in `exported`, never freed here); the edge cut
            # and int-edge cut in the LOCAL grave are fully consumed —
            # keep nodes, which the returned (lazy) decode join still reads
            _free_except(grave, (nodes,))
            if graveyard is not None:
                graveyard.extend(grave)
                graveyard.extend(exported)
            m = comp.select(F.col("node").alias("h"), F.col("label").alias("comp")).join(
                nodes, "h"
            ).select("node", "comp")
            rep = m.groupBy("comp").agg(F.min("node").alias("label"))
            return m.join(rep, "comp").select("node", "label")
        warnings.warn(
            "xxhash64 node encoding collided; contracting on raw ids",
            stacklevel=2,
        )
    exported = []
    out = _contract_raw(cur, driver_finish_edges, graveyard=exported)
    _free_except(grave, ())
    if graveyard is not None:
        graveyard.extend(grave)
        graveyard.extend(exported)
    return out


def _contract_raw(
    cur: DataFrame,
    driver_finish_edges: int = _DRIVER_FINISH_EDGES,
    graveyard: list[tuple[DataFrame, DataFrame]] | None = None,
) -> DataFrame:
    """Contraction core over already-materialized canonical (u, v) edges.

    Shiloach-Vishkin-style rounds: hook every node to min(self, min
    ε-neighbor) — a pointer forest rooted at local minima — then
    pointer-double to full depth (path compression), relabel edges by
    root and drop self-loops.  Roots form an independent set, so each
    round at least halves the contracted graph; with compression inside
    the round even an n-node path closes in O(log n) rounds (naive
    min-propagation needs n — test_dbscan_long_chain_converges)."""
    nodes = (
        cur.select(F.col("u").alias("node"))
        .unionByName(cur.select(F.col("v").alias("node")))
        .distinct()
    )
    # every per-round checkpoint is recorded here; once a round's new
    # cur/mapping are (eagerly) materialized, all older checkpoints are
    # dead and their blocks are released immediately — without this a
    # deep contraction pins one generation of blocks per round until
    # some future ContextCleaner GC.  The working list is ALWAYS local
    # (sharing the caller's would let inner frees kill caller-owned
    # checkpoints); `graveyard` is export-only — checkpoints still live
    # at return (the result plan's leaves) are appended so the caller can
    # free them once it has materialized the result.
    grave: list[tuple[DataFrame, DataFrame]] = []
    mapping = _cut(nodes.select("node", F.col("node").alias("label")), grave)
    for _ in range(_MAX_ROUNDS):
        n_edges = cur.count()
        if n_edges == 0:
            break
        if n_edges <= driver_finish_edges:
            # _driver_finish drains cur eagerly (toLocalIterator); the
            # returned plan references only mapping's checkpoint
            out = _driver_finish(cur, mapping)
            _free_except(grave, (mapping,))
            if graveyard is not None:
                graveyard.extend(grave)
            return out
        adj = cur.select(F.col("u").alias("s"), F.col("v").alias("t")).unionByName(
            cur.select(F.col("v").alias("s"), F.col("u").alias("t"))
        )
        star = _cut(
            adj.groupBy("s")
            .agg(F.min("t").alias("m"))
            .select("s", F.least("s", "m").alias("lab")),
            grave,
        )
        for _ in range(_MAX_ROUNDS):
            # Two pointer jumps fused into one materialization (4x depth per
            # round, one driver barrier): ptr <- ptr[ptr[ptr]] composed
            # lazily, then checkpointed once; the convergence test is a
            # cheap scan of the checkpointed result, not a recompute.
            ptr = star.select(F.col("s").alias("_k"), F.col("lab").alias("_v"))
            hop = _cut(
                star.select("s", F.col("lab").alias("old"))
                .join(ptr, F.col("old") == F.col("_k"))
                .select("s", "old", F.col("_v").alias("mid"))
                .join(ptr, F.col("mid") == F.col("_k"))
                .select("s", "old", F.col("_v").alias("new")),
                grave,
            )
            star = hop.select("s", F.col("new").alias("lab"))
            # hop is eager, so its predecessors (and the pre-loop star) are
            # consumed; keep only what later steps still read
            _free_except(grave, (cur, mapping, hop))
            if hop.filter(F.col("new") != F.col("old")).isEmpty():
                break
        else:
            raise RuntimeError("pointer doubling did not converge")
        relab = (
            cur.join(star.select(F.col("s").alias("u"), F.col("lab").alias("lu")), "u")
            .join(star.select(F.col("s").alias("v"), F.col("lab").alias("lv")), "v")
            .select(
                F.least("lu", "lv").alias("u"), F.greatest("lu", "lv").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mapping = _cut(
            mapping.join(
                star.select(F.col("s").alias("label"), F.col("lab").alias("_new")),
                "label",
                "left",
            ).select("node", F.coalesce("_new", "label").alias("label")),
            grave,
        )
        cur = _cut(relab, grave)
        _free_except(grave, (cur, mapping))
    else:
        raise RuntimeError(
            f"component contraction did not converge in {_MAX_ROUNDS} rounds"
        )
    _free_except(grave, (mapping,))
    if graveyard is not None:
        graveyard.extend(grave)
    return mapping


def dbscan(
    instances: DataFrame,
    eps: float,
    min_pts: int,
    cell_size: float | None = None,
    driver_finish_edges: int = _DRIVER_FINISH_EDGES,
) -> DataFrame:
    """DBSCAN over ``(feature, id, x, y)`` instances.

    Output: ``(id, cluster, role)`` for EVERY input instance —
    ``role`` in {'core', 'border', 'noise'}; ``cluster`` is the minimum
    core id of the cluster, NULL for noise.

    ``driver_finish_edges`` tunes when the contracted component graph is
    small enough to finish with driver-side union-find (0 = always fully
    distributed); output-invariant either way.
    """
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    pairs = neighbor_pairs(
        instances, eps, cell_size=cell_size, cross_feature_only=False
    ).select("a_id", "b_id")
    # The ε-graph feeds three downstream passes (degrees, core edges,
    # border neighbors): materialize once.
    pairs = pairs.persist()
    adj = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("t")).unionByName(
        pairs.select(F.col("b_id").alias("s"), F.col("a_id").alias("t"))
    )
    degrees = adj.groupBy("s").count()
    cores = degrees.filter(F.col("count") >= min_pts - 1).select(
        F.col("s").alias("id")
    )
    if min_pts <= 1:
        cores = instances.select("id")
    cores = cores.persist()

    core_edges = (
        pairs.join(cores.withColumnRenamed("id", "a_id"), "a_id", "left_semi")
        .join(cores.withColumnRenamed("id", "b_id"), "b_id", "left_semi")
        .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    )
    grave: list[tuple[DataFrame, DataFrame]] = []
    comp = _contract_components(core_edges, driver_finish_edges, graveyard=grave)
    core_clusters = cores.join(
        comp.withColumnRenamed("node", "id"), "id", "left"
    ).select(
        "id",
        # isolated core (no core neighbor): its own singleton cluster
        F.coalesce("label", "id").alias("cluster"),
        F.lit("core").alias("role"),
    )

    border = (
        adj.join(cores.withColumnRenamed("id", "s"), "s", "left_anti")
        .join(
            core_clusters.select(F.col("id").alias("t"), "cluster"),
            "t",
        )
        .groupBy("s")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("s").alias("id"), "cluster", F.lit("border").alias("role"))
    )

    # Materialize labels before dropping the ε-graph cache (localCheckpoint
    # is eager), so the final join cannot recompute neighbor_pairs.
    labeled = core_clusters.unionByName(border).localCheckpoint()
    pairs.unpersist()
    cores.unpersist()
    # labeled is eager, so the contraction's surviving checkpoints
    # (mapping / node-decode tables) are fully consumed — release them
    # now instead of at some future ContextCleaner GC
    _free_except(grave, ())
    return instances.select("id").join(labeled, "id", "left").select(
        "id",
        "cluster",
        F.coalesce("role", F.lit("noise")).alias("role"),
    )
