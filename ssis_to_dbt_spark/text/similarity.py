"""Similarity search over an embedding column (``array<float>``).

Two tiers, mirroring how an ANN service is actually built:

- ``brute_force_topk`` — exact cosine top-k of a query vector against the
  corpus.  One narrow projection + ``TakeOrderedAndProject`` (per-partition
  top-k, k-row driver merge): correct at any corpus size, cost linear in rows.
- ``lsh_bucket_candidates`` / ``lsh_topk`` — random-hyperplane (sign) LSH.
  Buckets come from deterministic xxhash64-derived hyperplanes, so the same
  vector always lands in the same bucket with no stored model.  Candidate
  generation is an equi-join on the bucket id — never an all-pairs cross join
  — which is the 100 TB scale path.

All vector math uses built-in higher-order functions (``zip_with`` /
``aggregate``), keeping the hot path in the JVM with no Python boundary.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --- SQL-text expression builders (r14 perf) --------------------------------
# Column-by-Column construction pays one py4j round-trip per operator
# node; the hot vector paths (centroid sims, probe cosines) build
# hundreds of nodes per plan, which measured as multiple SECONDS of
# driver-side plan construction per query.  These helpers render the
# IDENTICAL expression trees as SQL text — one F.expr()/selectExpr()
# call each — so results are bit-identical (same analyzed tree) while
# construction drops to string formatting.  Literal doubles render via
# repr(), whose shortest-round-trip decimal re-parses to the same bits
# (pinned in tests).


def _sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _sql_dlit(x: float) -> str:
    return repr(float(x)) + "D"


def _sql_arr(vals) -> str:
    return "array(" + ", ".join(_sql_dlit(v) for v in vals) + ")"


def _sql_as_double(c: str) -> str:
    return f"transform({c}, x -> CAST(x AS DOUBLE))"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x)"
    )


def _sql_l2(c: str) -> str:
    return (
        f"sqrt(aggregate(transform({c}, x -> x * x), 0.0D, "
        "(acc, x) -> acc + x))"
    )


def _sql_cosine(a: str, b: str) -> str:
    den = f"({_sql_l2(a)} * {_sql_l2(b)})"
    return (
        f"CASE WHEN {den} > 0 THEN {_sql_dot(a, b)} / {den} "
        "ELSE 0.0D END"
    )


def _with_centroid_sims(
    df: DataFrame, centroids, vec_col: str
) -> DataFrame:
    """Project ``_v``/``_norm`` and one ``_sim{cid}`` column per centroid
    (the shared head of :func:`ivf_assign` / :func:`route_queries`) as
    TWO selectExpr rounds — the trees are those the Column formulation
    built, at O(1) py4j calls."""
    df = df.withColumn(
        "_v", F.expr(_sql_as_double(_sql_ident(vec_col)))
    ).withColumn("_norm", F.expr(_sql_l2("_v")))
    sims = []
    for cid, cvec in centroids:
        cnorm = 0.0
        for x in cvec:
            cnorm = cnorm + float(x) * float(x)
        cnorm = math.sqrt(cnorm)
        den = f"(_norm * {_sql_dlit(cnorm)})"
        sims.append(
            f"CASE WHEN {den} > 0 THEN {_sql_dot('_v', _sql_arr(cvec))}"
            f" / {den} ELSE 0.0D END AS _sim{cid}"
        )
    return df.selectExpr("*", *sims)


def _ranked_cells_sql(centroids) -> str:
    """The ``sort_array(array(struct(sim, -cell)), desc)`` ranking over
    the ``_sim{cid}`` columns of :func:`_with_centroid_sims` — (sim
    desc, cell asc) by struct field order, as SQL text."""
    return "sort_array(array(" + ", ".join(
        f"named_struct('s', _sim{cid}, 'nc', {-cid})"
        for cid, _ in centroids
    ) + "), false)"


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; zero-norm vectors score 0 rather than NaN."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def _query_literal(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in query_vec])


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered best-first, id tiebreak.

    Plan shape: project cosine -> orderBy().limit(k) which Spark executes as
    TakeOrderedAndProject — no global sort of the corpus.
    """
    cos_sql = _sql_cosine(
        _sql_as_double(_sql_ident(vec_col)), _sql_arr(query_vec)
    )
    scored = df.selectExpr(
        _sql_ident(id_col), f"{cos_sql} AS cosine"
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _literal_plane_bucket(
    vec: "Column | str", planes: list[list[float]]
) -> Column:
    """Bucket id from compile-time constant ±1 hyperplanes: ``num_planes``
    sequential dot products against literal arrays — ZERO hash evaluations
    per row, and the identical IEEE expression tree the expression fallbacks
    evaluate, so bucket ids are bit-equal to theirs.  Pass ``vec`` as a
    SQL fragment (column name) to build the whole tree as ONE F.expr —
    the Column form costs ~10 py4j round-trips per plane at plan-build
    time (r14 perf)."""
    if isinstance(vec, str):
        terms = []
        for p, plane in enumerate(planes):
            dot = (
                f"aggregate(zip_with({vec}, {_sql_arr(plane)}, "
                "(x, s) -> CAST(x AS DOUBLE) * s), 0.0D, "
                "(acc, x) -> acc + x)"
            )
            terms.append(
                f"CASE WHEN {dot} > 0 THEN {1 << p}L ELSE 0L END"
            )
        return F.expr("(" + " + ".join(terms) + ")")
    total = None
    for p, plane in enumerate(planes):
        # one array literal per plane (a single py4j call — element-wise
        # F.lit would cost dims round-trips per plane at plan-build time)
        dot = F.aggregate(
            F.zip_with(vec, F.lit(plane), lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        total = term if total is None else total + term
    return total


def _py_bucket(vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side bucket id for a known query vector: the same sequential
    ``acc + x*s`` fold `_literal_plane_bucket` runs, in Python doubles —
    IEEE arithmetic in the identical order, so it is bit-equal to the Spark
    expression and saves a one-row Spark job per query."""
    b = 0
    for p, plane in enumerate(planes):
        acc = 0.0
        for x, s in zip(vec, plane):
            acc = acc + float(x) * s
        if acc > 0:
            b |= 1 << p
    return b


_XXHASH_PLANES_CACHE: dict[tuple[int, int, int], list[list[float]]] = {}


def _xxhash_sign_planes(num_planes: int, dims: int, seed: int) -> list[list[float]]:
    """Materialize the xxhash64 Rademacher sign matrix once per
    (num_planes, dims, seed) via one tiny Spark job (num_planes*dims rows —
    e.g. 16x64 = 1024), then cache driver-side.  ``xxhash64`` is
    deterministic for fixed input types, so the literal matrix reproduces the
    expression path exactly; ``p``/``j`` are cast to INT to match the
    ``sequence()``-typed operands of the fallback."""
    from pyspark.sql import SparkSession

    key = (num_planes, dims, seed)
    planes = _XXHASH_PLANES_CACHE.get(key)
    if planes is None:
        spark = SparkSession.getActiveSession()
        rows = (
            spark.range(num_planes * dims)
            .select(
                F.floor(F.col("id") / dims).cast("int").alias("p"),
                (F.col("id") % dims).cast("int").alias("j"),
            )
            .select(
                "p",
                "j",
                F.when(
                    F.xxhash64(F.lit(seed), F.col("p"), F.col("j")).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    F.lit(1.0),
                )
                .otherwise(F.lit(-1.0))
                .alias("s"),
            )
            .collect()
        )
        planes = [[0.0] * dims for _ in range(num_planes)]
        for r in rows:
            planes[r["p"]][r["j"]] = r["s"]
        _XXHASH_PLANES_CACHE[key] = planes
    return planes


def hyperplane_bucket(
    vec: "Column | str", num_planes: int = 16, seed: int = 0,
    dims: int | None = None,
) -> Column:
    """Sign-LSH bucket id (one bit per hyperplane, packed into a BIGINT).

    Hyperplane ``p``'s component ``j`` is a deterministic ±1 derived from
    ``xxhash64(seed, p, j)`` — a Rademacher random projection that needs no
    stored model and is reproducible across jobs and engines.

    When ``dims`` is known the sign matrix is materialized once by one tiny
    Spark job and embedded as literal arrays — the fallback expression path
    below evaluates ``num_planes * dims`` xxhash64 calls per ROW inside
    interpreted HOF lambdas (no codegen, no subexpression elimination), which
    is the scale-killing path; the literal path evaluates zero.
    """
    if dims is not None:
        return _literal_plane_bucket(
            vec, _xxhash_sign_planes(num_planes, dims, seed)
        )
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        dims,
                        lambda j: F.when(
                            F.xxhash64(F.lit(seed), p, j).bitwiseAND(F.lit(1)) == 1,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0)),
                    ),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    # pack bit p at position p: bit * 2^p, summed (shiftleft needs a literal)
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda b, p: b * F.pow(F.lit(2.0), p.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _md5_sign(p: int, j: int) -> float:
    """±1 from bit 0 of the first 60 bits of md5(f"{p},{j}") — computed with
    hashlib, which agrees with every SQL engine's md5 on ASCII input."""
    import hashlib

    h = hashlib.md5(f"{p},{j}".encode()).hexdigest()
    return 1.0 if int(h[:15], 16) & 1 == 1 else -1.0


def hyperplane_bucket_md5(
    vec: "Column | str", num_planes: int = 4, dims: int | None = None
) -> Column:
    """Sign-LSH bucket id with md5-derived hyperplanes.

    Plane ``p``'s component ``j`` is ±1 from bit 0 of
    ``md5(p || ',' || j)`` — portable to any engine with md5, so an external
    oracle can reproduce bucket assignments exactly.  Production path is
    :func:`hyperplane_bucket` (xxhash64 — same Rademacher construction,
    ~4x cheaper per component).

    When ``dims`` is known, the sign matrix is a compile-time constant:
    hashlib md5 equals any engine's md5 on ASCII, so the planes become
    literal arrays and the Spark plan computes ZERO hashes per row — just
    ``num_planes`` sequential dot products (the identical IEEE expression
    tree the expression fallback evaluates, so results are bit-equal).
    """
    if dims is not None:
        return _literal_plane_bucket(
            vec,
            [[_md5_sign(p, j) for j in range(dims)] for p in range(num_planes)],
        )
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        dims,
                        lambda j: F.when(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ",",
                                            p.cast("string"),
                                            j.cast("string"),
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            )
                            .cast("long")
                            .bitwiseAND(F.lit(1))
                            == 1,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0)),
                    ),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda b, p: b * F.pow(F.lit(2.0), p.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_topk_md5(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
) -> DataFrame:
    """Approximate top-k restricted to the query's md5-LSH bucket — the
    oracle-reproducible twin of :func:`lsh_topk`."""
    dims = len(query_vec)
    planes = [[_md5_sign(p, j) for j in range(dims)] for p in range(num_planes)]
    q_bucket = _py_bucket(query_vec, planes)
    candidates = df.filter(
        _literal_plane_bucket(_sql_ident(vec_col), planes)
        == F.lit(q_bucket)
    )
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def _cap_bucket_size(
    bucketed: DataFrame, id_col: str, max_bucket_size: int | None
) -> DataFrame:
    """Deterministically truncate each bucket to its first ``max_bucket_size``
    members (ordered by id), bounding a degenerate bucket's pair output at
    ``cap^2/2`` instead of quadratic in the corpus (e.g. a million identical
    vectors would otherwise put 5e11 pairs through one join task).  Truncation
    — not bucket dropping like the hot-shingle cap in dedup — because a
    single-band LSH pair has no second chance: an oversized bucket is exactly
    where the duplicates are, and the kept prefix still surfaces them."""
    if max_bucket_size is None:
        return bucketed
    w = Window.partitionBy("bucket").orderBy(id_col)
    return (
        bucketed.withColumn("_bn", F.row_number().over(w))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )


def lsh_bucket_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 0,
    dims: int | None = None,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-neighbor candidate pairs = vectors sharing an LSH bucket.

    Equi-join keyed on the bucket id: shuffle is proportional to corpus size,
    pair output to the bucket sizes — never an all-pairs comparison.  Pass
    ``dims`` whenever the embedding width is known so bucketing uses literal
    hyperplanes instead of per-row xxhash64 in interpreted lambdas.
    ``max_bucket_size`` caps degenerate buckets (see :func:`_cap_bucket_size`).
    """
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(
            _sql_ident(vec_col) if dims is not None else F.col(vec_col),
            num_planes, seed, dims,
        ).alias("bucket"),
    )
    bucketed = _cap_bucket_size(bucketed, id_col, max_bucket_size)
    left = bucketed.select(
        "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    right = bucketed.select(
        "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr(
            "id_a",
            "id_b",
            _sql_cosine(
                _sql_as_double("vec_a"), _sql_as_double("vec_b")
            ) + " AS cosine",
        )
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 0,
    dims: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket.

    With ``num_planes`` bits the corpus is cut ~``2**num_planes``-fold before
    any distance math — the IVF-style scale path.  Recall is tuned by lowering
    ``num_planes`` (bigger buckets) or unioning several ``seed`` probes.
    ``dims`` (the known embedding width) switches bucketing to literal
    hyperplanes — zero per-row hashing.
    """
    if dims is None:
        dims = len(query_vec)
    planes = _xxhash_sign_planes(num_planes, dims, seed)
    q_bucket = _py_bucket(query_vec, planes)
    candidates = df.filter(
        _literal_plane_bucket(_sql_ident(vec_col), planes)
        == F.lit(q_bucket)
    )
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def embedding_neardup_pairs_md5(
    df: DataFrame,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    dims: int | None = None,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via md5-LSH bucket blocking.

    Vectors sharing a sign-LSH bucket pair up through an equi-join on the
    bucket id (shuffle linear in corpus size, never all-pairs), then exact
    cosine filters to ``>= min_cosine``.  md5-derived hyperplanes make the
    bucket assignment — and therefore the full pair set — reproducible by an
    external oracle; :func:`lsh_bucket_candidates` is the xxhash64 production
    twin.  Recall tuning: fewer planes = bigger buckets = higher recall.
    """
    # Norms are computed ONCE per vector before the pair join (the per-value
    # expression tree — sqrt of the sequential self-dot — is identical to
    # computing it per pair, so cosine results are bit-equal), cutting the
    # per-pair work to a single dot product.
    bucketed = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
        hyperplane_bucket_md5(
            _sql_ident(vec_col) if dims is not None else F.col(vec_col),
            num_planes, dims,
        ).alias("bucket"),
    ).withColumn("_norm", F.expr(_sql_l2("_v")))
    bucketed = _cap_bucket_size(bucketed, id_col, max_bucket_size)
    left = bucketed.select(
        "bucket",
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("vec_a"),
        F.col("_norm").alias("norm_a"),
    )
    right = bucketed.select(
        "bucket",
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("vec_b"),
        F.col("_norm").alias("norm_b"),
    )
    denom = F.col("norm_a") * F.col("norm_b")
    cosine = F.when(
        denom > 0, dot_product(F.col("vec_a"), F.col("vec_b")) / denom
    ).otherwise(F.lit(0.0))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    salt_buckets: int = 64,
) -> DataFrame:
    """Exact k-NN join of a (small, broadcastable) query set against the
    corpus, two-phase so no task ever holds a corpus-sized partition.

    Phase 1 scores every (query, corpus) pair on the corpus partitions
    (broadcast queries — the big side is scanned in place) and keeps the
    top-k per ``(query, salt)`` where ``salt = xxhash64(corpus_id) %
    salt_buckets``; the one full-width shuffle carries only the narrow
    ``(query_id, corpus_id, cosine)`` triples and spreads them over
    ``n_queries * salt_buckets`` evenly-sized groups instead of funnelling
    the whole corpus into ``n_queries`` monster partitions.  Phase 2 ranks
    the ``<= n_queries * salt_buckets * k`` survivors, so the final
    per-query exchange carries ``salt_buckets * k`` rows per query — never
    the corpus.  The per-salt top-k is a superset of the global top-k and
    ties break on ``corpus_id``, so results are exact and deterministic.
    """
    pairs = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        F.expr(
            _sql_cosine(
                _sql_as_double(_sql_ident(corpus_vec)),
                _sql_as_double(_sql_ident(query_vec)),
            )
        ).alias("cosine"),
        F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(salt_buckets)).alias("_salt"),
    )
    w_local = Window.partitionBy(query_id, "_salt").orderBy(
        F.desc("cosine"), F.col(corpus_id)
    )
    survivors = (
        pairs.withColumn("_lrank", F.row_number().over(w_local))
        .filter(F.col("_lrank") <= k)
        .drop("_lrank", "_salt")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(corpus_id))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantize into centroid cells, probe a few
# ---------------------------------------------------------------------------

def ivf_centroids(
    df: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF "training": the centroid of cell ``c`` is the
    embedding with the ``c``-th lowest id.  A real deployment would run
    k-means here; id-seeded centroids keep the index reproducible with no
    stored model (same property the LSH planes have) and are exactly
    reproducible by an external SQL oracle.  Collects ``n_cells`` rows —
    a bounded scalar-sized fetch, like a MIN/MAX watermark, not a data scan.
    """
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    return [
        (c, [float(x) for x in row[vec_col]]) for c, row in enumerate(rows)
    ]


def _py_cosine(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the same sequential fold order as
    :func:`cosine_similarity` (IEEE-identical, used for query routing)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
        na = na + float(x) * float(x)
        nb = nb + float(y) * float(y)
    denom = math.sqrt(na) * math.sqrt(nb)
    return dot / denom if denom > 0 else 0.0


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    sim_col: str | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties -> lowest
    cell id).  Centroids are embedded as LITERAL arrays, so assignment is a
    map-only linear scan — no shuffle, no per-row hashing; at 100 TB the
    assigned frame is written partitioned/bucketed by ``cell`` so a probe
    becomes partition pruning instead of a filter scan.

    Each centroid similarity is projected ONCE as a real column before the
    argmax fold (interpreted HOF lambdas would otherwise re-evaluate every
    dot product per comparison).

    ``sim_col`` additionally keeps the winning cosine (used by the k-means
    entry to report the final assignment quality without a second pass).

    An empty centroid list (only possible when the corpus that trained it
    was empty) assigns the typed sentinel cell -1 to the zero input rows —
    the argmax over an empty struct array would otherwise be VOID-typed and
    fail analysis downstream.
    """
    if not centroids:
        out = df.withColumn(cell_col, F.lit(-1).cast("int"))
        return out.withColumn(sim_col, F.lit(0.0)) if sim_col else out
    df = _with_centroid_sims(df, centroids, vec_col)
    # argmax via max-of-structs: (sim, -cell) compares field-by-field, so the
    # max is the highest sim with the LOWEST cell id on exact ties — linear
    # plan size (a chained when-fold would double the tree per centroid)
    best_sql = "array_max(array(" + ", ".join(
        f"named_struct('s', _sim{cid}, 'nc', {-cid})"
        for cid, _ in centroids
    ) + "))"
    out = df.withColumn(cell_col, F.expr(f"-(({best_sql}).nc)"))
    if sim_col:
        out = out.withColumn(sim_col, F.expr(f"({best_sql}).s"))
    return out.drop("_v", "_norm", *[f"_sim{cid}" for cid, _ in centroids])


def farthest_point_seeds(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> list[tuple[int, int, list[float]]]:
    """Deterministic k-means++-style seeding: md5-anchored farthest-point
    traversal.  The lowest-id seeding of :func:`ivf_centroids` is degenerate
    when the first ``k`` vectors are near-identical (duplicate/empty cells);
    this picks well-spread seeds with NO randomness:

    - seed 0 = the vector with the lowest ``md5(cast(id as string))``
      (content-addressed: reproducible under any partitioning, and not
      biased toward low ids the way lowest-id seeding is);
    - seed i = the vector maximizing the minimum cosine DISTANCE to the
      seeds chosen so far (classic farthest-point / k-center traversal —
      the deterministic replacement for k-means++'s D^2 sampling), with
      the distance quantized to ``round_digits`` BEFORE the argmax and
      ties broken by lowest id, so an external SQL oracle reproduces the
      exact seed sequence.

    Plan shape per seed: one map-only scan (each seed similarity staged
    once as a real column, max-of-columns, no shuffle) ending in
    TakeOrdered(1) — k passes over the corpus total, each returning ONE
    row to the driver.  At true 100 TB scale run it on a hash-sampled
    subset (:func:`..operators.sampling.hash_sample`) — farthest-point on
    a 0.1% sample is the standard k-center approximation; the operator
    itself stays exact on whatever frame it is given.

    Returns ``[(seed_idx, source_id, vector), ...]``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    first = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(1)
        .collect()
    )
    if not first:
        return []
    seeds = [(first[0][id_col], [float(x) for x in first[0][vec_col]])]
    v_sql = _sql_as_double(_sql_ident(vec_col))
    while len(seeds) < k:
        sims = [
            f"{_sql_cosine(v_sql, _sql_arr(vec))} AS _s{j}"
            for j, (_, vec) in enumerate(seeds)
        ]
        staged = df.selectExpr(
            _sql_ident(id_col), _sql_ident(vec_col), *sims
        )
        max_sim = (
            F.col("_s0")
            if len(seeds) == 1
            else F.greatest(*[F.col(f"_s{j}") for j in range(len(seeds))])
        )
        cand = (
            staged.select(
                F.col(id_col),
                F.col(vec_col),
                F.round(F.lit(1.0) - max_sim, round_digits).alias("_d"),
            )
            .orderBy(F.desc("_d"), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        seeds.append((cand[id_col], [float(x) for x in cand[vec_col]]))
    return [(i, sid, vec) for i, (sid, vec) in enumerate(seeds)]


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    seeding: str = "lowest_id",
    assign_engine: str = "expr",
) -> list[tuple[int, list[float]]]:
    """Lloyd k-means over the embedding column, composed from the engine's
    own pieces: init = the ``k`` lowest-id embeddings (:func:`ivf_centroids`
    — deterministic, model-free), then each round is a map-only
    nearest-centroid assignment against LITERAL centroids
    (:func:`ivf_assign`, no shuffle of the corpus) followed by a
    per-(cell, dim) decimal-summed mean — the :func:`label_centroids`
    discipline, order-independent under any partitioning.

    The only driver traffic per round is the k x dims rounded-mean table
    (model-sized, the same contract as the BPE per-round argmax); the
    corpus itself never leaves the cluster.  Means are ``round(·,
    round_digits)``-quantized before becoming the next round's literals, so
    the whole training run is portable across engines and an unrolled SQL
    oracle reproduces it bit-for-bit.  A cell that loses all members keeps
    its previous centroid.

    Returns the trained ``[(cell, centroid_vector), ...]`` — feed it to
    :func:`ivf_assign` for the final labeling, or to :func:`ivf_topk` as a
    data-adapted coarse quantizer (the real-deployment replacement for the
    id-seeded ``ivf_centroids``).

    ``seeding``: ``"lowest_id"`` (default — the original deterministic
    init) or ``"farthest"`` (:func:`farthest_point_seeds` — well-spread
    md5-anchored k-center seeds; use when the lowest-id vectors may be
    near-identical, which leaves duplicate/empty cells).

    ``assign_engine``: ``"expr"`` (default — pure-JVM plan) or ``"arrow"``
    (:func:`assign_cells_arrow`, bit-identical by the pinned pytest —
    faster when k x dims makes the interpreted-HOF cosine the round's
    floor; the trained centroids are identical either way).
    """
    if assign_engine not in ("expr", "arrow"):
        raise ValueError(f"unknown assign_engine {assign_engine!r}")
    if seeding == "farthest":
        cents = [(i, vec) for i, _sid, vec in farthest_point_seeds(
            df, k, id_col, vec_col, round_digits
        )]
    elif seeding == "lowest_id":
        cents = ivf_centroids(df, k, id_col, vec_col)
    else:
        raise ValueError(f"unknown seeding {seeding!r}")
    for _ in range(rounds):
        if assign_engine == "arrow":
            assigned = assign_cells_arrow(df, cents, id_col, vec_col)
        else:
            assigned = ivf_assign(df, cents, id_col, vec_col)
        x = assigned.select(
            F.col("cell"),
            F.posexplode(_as_double(F.col(vec_col))).alias("dim", "_x"),
        )
        cell = x.groupBy("cell", "dim").agg(
            F.sum(F.col("_x").cast("decimal(38,18)")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        rows = cell.select(
            "cell",
            "dim",
            F.round(
                F.col("_s").cast("double") / F.col("_n"), round_digits
            ).alias("m"),
        ).collect()
        new = {cid: list(vec) for cid, vec in cents}
        for r in rows:
            new[r["cell"]][r["dim"]] = float(r["m"])
        cents = [(cid, new[cid]) for cid, _ in cents]
    return cents


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: brute-force cosine restricted to the ``nprobe``
    cells whose centroids are closest to the query.

    The query is routed driver-side with the same sequential-fold cosine the
    cluster runs (bit-identical, zero extra jobs), then the scan prunes to
    ``~nprobe/n_cells`` of the corpus and finishes with
    ``TakeOrderedAndProject``.  Complements :func:`lsh_topk`: IVF cells adapt
    to the data distribution (centroids are data points), LSH buckets are
    data-independent.
    """
    if centroids is None:
        centroids = ivf_centroids(df, n_cells, id_col, vec_col)
    ranked = sorted(
        ((_py_cosine(query_vec, cvec), cid) for cid, cvec in centroids),
        key=lambda t: (-t[0], t[1]),
    )
    probe = [cid for _, cid in ranked[:nprobe]]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    candidates = assigned.filter(F.col("cell").isin(probe))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def project_embeddings(
    df: DataFrame,
    out_dim: int = 8,
    dims: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson–Lindenstrauss sign (Rademacher) random projection:
    ``y_p = sum_j v_j * s_pj`` with ``s_pj = ±1`` from md5 (the same
    portable construction as :func:`hyperplane_bucket_md5`, but keeping the
    projected VALUES instead of sign bits) — the dimensionality-reduction
    step before a cheaper ANN pass or storage-bound shuffle.

    Map-only, zero per-row hashing (the sign matrix is a compile-time
    literal), sequential in-index fold per output dim so any engine folding
    in the same order reproduces every double bit-for-bit.  The 1/sqrt(k)
    JL normalization is omitted deliberately: it is a constant positive
    scale, invariant for cosine/top-k downstream (documented so thresholds
    are calibrated against THIS definition).  Returns (id, projected)."""
    planes = [[_md5_sign(p, j) for j in range(dims)] for p in range(out_dim)]
    v = F.col(vec_col)
    comps = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(s) for s in row]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"_p{p}")
        for p, row in enumerate(planes)
    ]
    return df.select(F.col(id_col), F.array(*comps).alias("projected"))


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Per-label mean embedding (class prototype): explode to (label, dim,
    value), decimal-sum per cell (order-independent — double summation
    would vary with partitioning), divide at the output boundary as a
    round-``round_digits`` double.  One shuffle keyed (label, dim); state
    is labels x dims cells.  Returns (label, dim, mean_r, n)."""
    x = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(_as_double(F.col(vec_col))).alias("dim", "_v"),
    )
    cell = x.groupBy("label", "dim").agg(
        F.sum(F.col("_v").cast("decimal(38,18)")).alias("_s"),
        F.count(F.lit(1)).alias("n"),
    )
    return cell.select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.round(F.col("_s").cast("double") / F.col("n"), round_digits).alias(
            "mean_r"
        ),
        F.col("n").cast("long").alias("n"),
    )


def prototype_assign(
    df: DataFrame,
    centroids: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-prototype classification: cosine against each literal class
    centroid (a model-sized dict label -> vector, e.g. collected from
    :func:`label_centroids`), argmax with smallest-label tie-break —
    map-only, zero per-row hashing, the same literal-array discipline as
    the IVF/LSH paths.  Returns (id, pred_label, cosine).

    Each class cosine is projected ONCE as a real column, then the argmax
    is a single max-of-structs over (cosine, -label) — field-by-field
    struct comparison keeps the plan LINEAR in the class count and breaks
    exact ties toward the smaller label.  (A chained
    ``when(c > best, ...)`` fold would embed the running best twice per
    class — an exponentially-growing expression tree that stalls codegen
    and exhausts driver heap beyond ~8 classes.)

    ``centroids`` must be ``dict[int | float, list[float]]``: the
    smallest-label tie-break is encoded as ``-label`` inside the argmax
    struct, which requires NUMERIC labels (string labels raise here rather
    than failing obscurely in expression analysis)."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    non_numeric = [
        lab
        for lab in centroids
        if isinstance(lab, bool) or not isinstance(lab, (int, float))
    ]
    if non_numeric:
        raise ValueError(
            "prototype_assign requires numeric (int/float) class labels for "
            f"the -label tie-break; got non-numeric labels: {non_numeric!r}"
        )
    v_sql = _sql_as_double(_sql_ident(vec_col))
    labs = sorted(centroids)
    staged = df.selectExpr(
        "*",
        *[
            f"{_sql_cosine(v_sql, _sql_arr(centroids[lab]))} AS _pcos{i}"
            for i, lab in enumerate(labs)
        ],
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"_pcos{i}").alias("c"),
                    F.lit(-lab).alias("nl"),
                )
                for i, lab in enumerate(labs)
            ]
        )
    )
    return staged.select(
        F.col(id_col),
        (-best.getField("nl")).alias("pred_label"),
        best.getField("c").alias("cosine"),
    )


def prototype_assign_arrow(
    df: DataFrame,
    centroids: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow (``mapInPandas``) twin of :func:`prototype_assign` — same
    output schema ``(id, pred_label, cosine)``, BIT-IDENTICAL values
    (pytest-pinned): the same sequential-fold cosine as
    :func:`assign_cells_arrow` (the proven ivf_assign twin), strict ``>``
    updates iterating labels ascending = the smallest-label tie-break of
    the expression path's ``(cosine, -label)`` argmax.

    Exists because the expression path evaluates ``len(centroids)``
    interpreted-HOF cosines per row (no codegen inside lambdas); here each
    class is one vectorized numpy fold per Arrow batch.  Map-only — one
    ArrowEvalPython stage, no shuffle.  Numeric labels required, same
    contract as the expression twin."""
    import numpy as np

    from pyspark.sql import types as T

    if not centroids:
        raise ValueError("centroids must be non-empty")
    non_numeric = [
        lab
        for lab in centroids
        if isinstance(lab, bool) or not isinstance(lab, (int, float))
    ]
    if non_numeric:
        raise ValueError(
            "prototype_assign requires numeric (int/float) class labels for "
            f"the -label tie-break; got non-numeric labels: {non_numeric!r}"
        )
    labs = sorted(centroids)
    cvecs = [np.asarray(centroids[lab], dtype=np.float64) for lab in labs]
    cnorms = []
    for c in cvecs:
        s = 0.0
        for x in c:  # scalar sequential fold — mirrors l2_norm's aggregate
            s = s + float(x) * float(x)
        cnorms.append(math.sqrt(s))
    id_field = df.schema[id_col]
    label_type = (
        T.DoubleType()
        if any(isinstance(lab, float) for lab in labs)
        else T.LongType()
    )
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("pred_label", label_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _np_stack_f64(pdf[vec_col])
            nrm = np.sqrt(_np_fold_dot(v, v))
            best_s = None
            best_l = None
            for lab, c, cn in zip(labs, cvecs, cnorms):
                acc = np.zeros(len(v), dtype=np.float64)
                for j in range(v.shape[1]):
                    acc = acc + v[:, j] * c[j]
                den = nrm * cn
                sim = np.divide(
                    acc, den, out=np.zeros_like(acc), where=den > 0
                )
                if best_s is None:
                    best_s = sim
                    best_l = np.full(len(v), lab, dtype=np.float64)
                else:
                    take = sim > best_s  # strict: ties keep the lowest label
                    best_s = np.where(take, sim, best_s)
                    best_l = np.where(take, lab, best_l)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pred_label": (
                        best_l
                        if isinstance(label_type, T.DoubleType)
                        else best_l.astype("int64")
                    ),
                    "cosine": best_s,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def hard_negatives(
    df: DataFrame,
    k: int = 3,
    dup_threshold: float = 0.95,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector, the
    ``k`` most similar corpus vectors with a DIFFERENT label, excluding
    near-duplicates (``cosine >= dup_threshold`` — those are mislabels or
    leaks, not negatives).

    Plan shape: corpus x broadcast(query set) scoring (the query side must
    be model-sized — sample it; each corpus row scores against all queries
    in one map-side pass), then a per-query top-k window.  At 100 TB
    restrict candidates first with the LSH/IVF bucketing in this module
    (:func:`lsh_bucket_candidates` / :func:`ivf_topk`) and feed the
    bucketed pairs here — the scoring expression is identical.  Catalyst
    pushes the dup-threshold filter into the join condition, so the cosine
    evaluates twice for surviving rows (condition + projection) — accepted:
    survivors are k-per-query few, and blocking the pushdown would cost a
    materialization barrier on the corpus-sized side.

    Both L2 norms are staged as per-ROW columns below the join (a join is a
    CollapseProject barrier, so each norm fold runs once per row, not once
    per pair) — the per-pair work is just the dot product.  The arithmetic
    (``dot / (norm_c * norm_q)``, same operation order) is bit-identical to
    :func:`cosine_similarity`; only the evaluation count changes.
    Returns (q_id, vec_id, cosine, rank)."""
    if queries is None:
        queries = df
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
        F.col(label_col).alias("_qlabel"),
    ).withColumn("_qn", l2_norm(F.col("_qv")))
    c = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"), F.col(label_col)
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    denom = F.col("_cn") * F.col("_qn")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col(id_col) != F.col("q_id"))
            & (F.col(label_col) != F.col("_qlabel"))
        )
        .select(
            "q_id",
            id_col,
            F.when(
                denom > 0,
                dot_product(F.col("_cv"), F.col("_qv")) / denom,
            )
            .otherwise(F.lit(0.0))
            .alias("cosine"),
        )
        .filter(F.col("cosine") < dup_threshold)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "cosine", F.col("rank").cast("int").alias("rank"))
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage-compression step
    an embedding corpus runs before archiving (4x smaller than float32,
    ~1e-2 cosine error at dim 64): ``q_i = round(x_i / max_abs * 127)``.

    Output is EXPLODED to ``(id, dim, q, scale)`` scalar rows: per-element
    arithmetic is pure per-row double math (bit-identical across engines),
    so the quantized values verify exactly where packed-array outputs would
    be hostage to engine array rendering.  A production sink would
    re-assemble with ``collect_list`` over dim or write fixed-size binary.
    Map-only — no shuffle at any corpus size.
    """
    v = _as_double(F.col(vec_col))
    base = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("scale"),
    )
    return base.select(
        id_col,
        F.posexplode("_v").alias("dim", "_x"),
        "scale",
    ).select(
        id_col,
        "dim",
        F.when(
            F.col("scale") > 0,
            F.round(F.col("_x") / F.col("scale") * 127).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("q"),
        "scale",
    )


def _np_stack_f64(series) -> "object":
    """Stack a pandas Series of float32 list-values into an (n, d) float64
    matrix.  float32 -> float64 widening is exact, so this is the Arrow twin
    of ``_as_double``'s per-element cast."""
    import numpy as np

    return np.stack([np.asarray(x, dtype=np.float64) for x in series])


def _np_fold_dot(a, b):
    """Row-wise dot product as a SEQUENTIAL left fold over dimensions,
    vectorized across rows: ``acc = acc + a[:, j] * b[:, j]`` for j ascending.

    IEEE 754 ops are deterministic given evaluation order, and this is the
    exact order of :func:`dot_product`'s ``F.aggregate(zip_with(a, b, *),
    0.0, +)`` fold and of DuckDB's ``list_inner_product`` — so the Arrow
    kernels below are BIT-EXACT with the expression path and the SQL oracle,
    not merely close.  (A numpy ``a @ b`` matmul would be ~the same speed
    here but sums in BLAS-defined order, which breaks the hash oracle.)
    """
    import numpy as np

    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc = acc + a[:, j] * b[:, j]
    return acc


def assign_cells_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Arrow (``mapInPandas``) twin of :func:`ivf_assign`: nearest centroid
    by cosine, ties to the lowest cell id, zero-norm vectors scoring 0.0
    against every centroid.  Same float math in the same order (sequential
    dimension fold, python-float centroid norms), so the assigned cell ids
    are bit-identical to the expression path — pytest asserts this.

    Still map-only (one ArrowEvalPython stage, no shuffle); exists because
    interpreted HOF lambdas cost ~1 µs per expression node, which makes the
    k-cosine argmax the dominant cost of the expression formulation, while
    this kernel is k vectorized folds per Arrow batch.  The expression path
    remains the right one where the plan must stay pure-JVM (the IVF probe's
    partition-pruning rewrite); assignment feeding a grouped-map stage (the
    SemDeDup pipeline) already crosses the Arrow boundary anyway.

    Finite inputs assumed (fixtures are): NaN sims would tie-break
    differently from Spark's NaN-is-largest ordering.
    """
    import numpy as np

    if not centroids:
        # same contract as ivf_assign: typed sentinel cell -1, never a crash
        return df.withColumn(cell_col, F.lit(-1).cast("int"))

    cids = [cid for cid, _ in centroids]
    cvecs = [np.asarray(c, dtype=np.float64) for _, c in centroids]
    cnorms = []
    for c in cvecs:
        s = 0.0
        for x in c:  # scalar sequential fold — mirrors ivf_assign's cnorm
            s = s + float(x) * float(x)
        cnorms.append(math.sqrt(s))
    from pyspark.sql import types as T

    # fresh StructType — .add() mutates the instance cached on the DataFrame
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(cell_col, T.IntegerType())]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _np_stack_f64(pdf[vec_col])
            nrm = np.sqrt(_np_fold_dot(v, v))
            best_s = None
            best_c = None
            for cid, c, cn in zip(cids, cvecs, cnorms):
                acc = np.zeros(len(v), dtype=np.float64)
                for j in range(v.shape[1]):
                    acc = acc + v[:, j] * c[j]
                den = nrm * cn
                sim = np.divide(
                    acc, den, out=np.zeros_like(acc), where=den > 0
                )
                if best_s is None:
                    best_s, best_c = sim, np.full(len(v), cid, dtype=np.int64)
                else:
                    take = sim > best_s  # strict: ties keep the lowest cid
                    best_s = np.where(take, sim, best_s)
                    best_c = np.where(take, cid, best_c)
            out = pdf.copy()
            out[cell_col] = best_c.astype("int32")
            yield out

    return df.mapInPandas(gen, schema)


def semdedup(
    df: DataFrame,
    n_cells: int = 8,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus into centroid cells, compare
    embeddings only WITHIN a cell, and mark a vector as a semantic duplicate
    when some lower-id cell-mate is >= ``tau`` cosine-similar to it.

    Output: one row per input vector —
    ``(id_col, cell, dup_of, max_cos_r)`` where ``dup_of`` is the LOWEST id
    of any qualifying cell-mate (NULL = kept / cluster representative) and
    ``max_cos_r`` is the highest qualifying cosine, rounded to 6 places.
    ``dup_of IS NULL`` is the keep-filter a curation pipeline applies.

    Scale shape: the only quadratic term is the within-cell self-join — one
    shuffle on ``cell`` — so cost is sum(|cell|^2), bounded by scaling
    ``n_cells`` with the corpus exactly as production SemDeDup scales its
    k-means k (the paper uses ~100k clusters; centroid assignment stays a
    map-only scan of literal centroids either way).  No all-pairs join, no
    driver-side data collect (``ivf_centroids`` fetches n_cells rows, a
    bounded model-sized fetch).

    Two engines with bit-identical output (pytest-asserted):

    - ``engine="arrow"`` (default) — map-only Arrow cell assignment
      (:func:`assign_cells_arrow`), then ONE hash shuffle on ``cell`` into a
      grouped ``applyInPandas`` kernel that generates the within-cell pairs
      and reduces them to per-member (dup_of, max_cos) in numpy.  This is
      literally the production SemDeDup shape — per-cluster pairwise on a
      vectorized backend — and all float math is the sequential fold of
      :func:`_np_fold_dot`, so the SQL oracle still hash-matches.  Pairs
      never materialize as Spark rows.
    - ``engine="expr"`` — pure-JVM formulation: ``ivf_assign`` + a self
      equi-join on ``cell`` with HOF cosine scoring.  Same plan family, no
      Python boundary, ~20x slower at equal output (interpreted lambdas);
      kept as the differential-testing twin and for Arrow-less deployments.

    The dup summary in the expr path re-joins on ``id_col``; AQE turns it
    into a broadcast join when few duplicates qualify.
    """
    if centroids is None:
        centroids = ivf_centroids(df, n_cells, id_col, vec_col)
    if engine == "arrow":
        return _semdedup_arrow(df, tau, id_col, vec_col, centroids)
    assigned = ivf_assign(
        df.select(id_col, vec_col), centroids, id_col, vec_col
    )
    base = assigned.select(
        F.col(id_col),
        F.col("cell"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_norm", l2_norm(F.col("_v")))
    a = base.select(
        F.col(id_col).alias("_ida"),
        "cell",
        F.col("_v").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    b = base.select(
        F.col(id_col).alias("_idb"),
        "cell",
        F.col("_v").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    denom = F.col("_na") * F.col("_nb")
    cos = F.when(
        denom > 0, dot_product(F.col("_va"), F.col("_vb")) / denom
    ).otherwise(F.lit(0.0))
    dup = (
        a.join(b, on="cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= F.lit(float(tau)))
        .groupBy("_idb")
        .agg(
            F.min("_ida").alias("dup_of"),
            F.round(F.max("_cos"), 6).alias("max_cos_r"),
        )
    )
    return base.select(id_col, "cell").join(
        dup.withColumnRenamed("_idb", id_col), on=id_col, how="left"
    )


def _semdedup_arrow(
    df: DataFrame,
    tau: float,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    max_pairs_chunk: int = 2_000_000,
    gram_max_n: int = 4096,
) -> DataFrame:
    """Arrow engine for :func:`semdedup`: grouped per-cell pair reduction.

    Each cell's members arrive as one pandas group (cells are bounded by
    scaling n_cells with the corpus, so a group always fits a task).
    Cells up to ``gram_max_n`` members take the GRAM path (r14 perf): the
    pairwise dot matrix accumulates as ``G += outer(v[:,d], v[:,d])`` for
    d ascending — per (i,j) element that is the identical IEEE op
    sequence as :func:`_np_fold_dot`'s fold (one multiply-add per dim, in
    dim order), so dots stay BIT-EXACT while the working set drops from
    ``pairs x dim x 8B`` gathered copies (~1.5 GB at n=1500, d=64 —
    measured 10-100x slower than the O(n^2) Gram under cold-page
    first-touch costs) to one n^2 matrix (~18 MB).  Larger cells fall
    back to the original ``np.triu_indices`` pair chunks at
    ``max_pairs_chunk`` pairs, which bound peak memory when n^2 itself
    is the problem.  Per-member reduction uses ``np.minimum.at`` /
    ``np.maximum.at`` — comparison-only ops, order-independent, so the
    min/max match ``F.min``/``F.max`` exactly.  Rounding stays on the
    Spark side (``F.round`` half-up; ``np.round`` is half-even — the one
    op the kernel must NOT do).
    """
    import numpy as np
    import pandas as pd

    tau_f = float(tau)

    def kern(pdf):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        n = len(ids)
        cell_val = int(pdf["cell"].iloc[0])
        best_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        best_cos = np.full(n, -np.inf, dtype=np.float64)
        has = np.zeros(n, dtype=bool)
        if 2 <= n <= gram_max_n:
            v = _np_stack_f64(pdf[vec_col])[order]
            nrm = np.sqrt(_np_fold_dot(v, v))
            vT = np.ascontiguousarray(v.T)
            G = np.zeros((n, n), dtype=np.float64)
            tmp = np.empty((n, n), dtype=np.float64)
            for d in range(vT.shape[0]):
                np.multiply.outer(vT[d], vT[d], out=tmp)
                G += tmp
            ii, jj = np.triu_indices(n, 1)
            dot = G[ii, jj]
            den = nrm[ii] * nrm[jj]
            cos = np.divide(dot, den, out=np.zeros_like(dot), where=den > 0)
            q = cos >= tau_f
            iq, jq, cq = ii[q], jj[q], cos[q]
            np.minimum.at(best_min, jq, ids[iq])
            np.maximum.at(best_cos, jq, cq)
            has[jq] = True
        elif n > gram_max_n:
            v = _np_stack_f64(pdf[vec_col])[order]
            nrm = np.sqrt(_np_fold_dot(v, v))
            ii, jj = np.triu_indices(n, 1)
            for s in range(0, len(ii), max_pairs_chunk):
                ic, jc = ii[s : s + max_pairs_chunk], jj[s : s + max_pairs_chunk]
                dot = _np_fold_dot(v[ic], v[jc])
                den = nrm[ic] * nrm[jc]
                cos = np.divide(
                    dot, den, out=np.zeros_like(dot), where=den > 0
                )
                q = cos >= tau_f
                iq, jq, cq = ic[q], jc[q], cos[q]
                np.minimum.at(best_min, jq, ids[iq])
                np.maximum.at(best_cos, jq, cq)
                has[jq] = True
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": np.full(n, cell_val, dtype=np.int32),
                "dup_of": pd.array(
                    [int(best_min[i]) if has[i] else None for i in range(n)],
                    dtype="Int64",
                ),
                "max_cos_r": pd.array(
                    [float(best_cos[i]) if has[i] else None for i in range(n)],
                    dtype="Float64",
                ),
            }
        )

    assigned = assign_cells_arrow(
        df.select(id_col, vec_col), centroids, id_col, vec_col
    )
    res = assigned.groupBy("cell").applyInPandas(
        kern, schema=f"{id_col} long, cell int, dup_of long, max_cos_r double"
    )
    return res.select(
        id_col, "cell", "dup_of", F.round("max_cos_r", 6).alias("max_cos_r")
    )


# ---------------------------------------------------------------------------
# Persisted IVF-ANN index (r11): the vector twin of the persisted
# cross-corpus dedup index (text/dedup.py write/read/append/probe) — the
# corpus is assigned to centroid cells ONCE, written partitioned by cell,
# and every later query batch reads only its probed partitions.
# ---------------------------------------------------------------------------


@dataclass
class IvfIndex:
    """Persisted IVF index handle: the (bounded, model-sized) centroid
    list plus the cell-partitioned assignment frame.  ``assign`` reads
    straight off the partitioned parquet layout, so a probe's
    ``cell IN (...)`` literal filter becomes PARTITION PRUNING — the
    100 TB corpus is never re-scanned or re-assigned per query batch."""

    centroids: list[tuple[int, list[float]]]
    assign: DataFrame  # (cell int, vec_id, embedding)


def write_ivf_index(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> IvfIndex:
    """Build and persist an IVF index: assign every vector to its nearest
    centroid (map-only — centroids are literal arrays) and write the
    assignments PARTITIONED BY cell under ``{path}/assign``, with the
    centroid table under ``{path}/centroids``.

    ``centroids=None`` uses the deterministic id-seeded "training"
    (:func:`ivf_centroids`); pass :func:`kmeans_fit` output for real
    centroids — the index layout and probe path are identical.

    100 TB shape: one map-only assignment pass + one partitioned write.
    No shuffle — the partitioned write routes rows by the cell value
    per-task.  Probes then touch ``nprobe/n_cells`` of the data via
    partition pruning (plan-pinned), the same read-amplification contract
    as the bucketed dedup index."""
    from .. import fs as _fs

    spark = df.sparkSession
    # a FULL write supersedes any staged recluster generation: a stale
    # committed `_recluster_stage` under this path would otherwise roll
    # OVER the fresh index at the next read-time heal
    _fs.delete(spark, f"{path}/_recluster_stage")
    if centroids is None:
        centroids = ivf_centroids(df, n_cells, id_col, vec_col)
    assigned = ivf_assign(df, centroids, id_col, vec_col, cell_col="cell")
    assigned.select("cell", id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/assign")
    # centroid table as a JVM LocalRelation (r14 perf): inline() over
    # literal structs writes the model-sized table in ONE single-task
    # job — no Python-partition spread (a parallelized local list lands
    # on default-parallelism Python slices), no repartition shuffle.
    # Doubles render via repr() (shortest round-trip re-parses to the
    # same bits, pinned in tests), so the stored values are exactly the
    # in-memory centroids.
    structs = ", ".join(
        f"named_struct('cell', {int(c)}, 'centroid', {_sql_arr(v)})"
        for c, v in centroids
    )
    spark.range(1).selectExpr(f"inline(array({structs}))").selectExpr(
        "CAST(cell AS INT) AS cell", "centroid"
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    # the handle is constructible without re-reading what we just wrote:
    # centroids are in hand, the assignment frame is lazy on the
    # partitioned layout (read_ivf_index yields the identical handle)
    assign = spark.read.parquet(f"{path}/assign").select(
        F.col("cell").cast("int").alias("cell"), id_col, vec_col
    )
    return IvfIndex(
        centroids=sorted(
            (int(c), [float(x) for x in v]) for c, v in centroids
        ),
        assign=assign,
    )


def _heal_ivf_recluster(spark, path: str) -> None:
    """Finish (or discard) a :func:`recluster_ivf_index` in-place swap a
    crash left half-done — the IVF member of the staged-generation heal
    family (BM25 compaction ``_heal_bm25_compaction``, dedup
    ``_heal_compaction_swap``).  The recluster stages the ENTIRE new
    generation (assign + centroids) under ``{path}/_recluster_stage``
    and touches ``_COMMIT`` only after both writes fully return:

    - stage present WITHOUT ``_COMMIT`` -> crashed mid-build: delete the
      stage; the live generation was never touched.
    - stage present WITH ``_COMMIT`` -> committed-by-marker: roll the
      swap forward child-by-child (delete the live child, rename the
      staged child in — each step idempotent, so a crash mid-heal
      re-heals), then delete the emptied stage.

    Every step is a driver-side Hadoop-FS metadata call."""
    from .. import fs as _fs

    stage = f"{path}/_recluster_stage"
    if not _fs.exists(spark, stage):
        return
    if not _fs.exists(spark, f"{stage}/_COMMIT"):
        _fs.delete(spark, stage)
        return
    for child in ("assign", "centroids"):
        if _fs.exists(spark, f"{stage}/{child}"):
            _fs.delete(spark, f"{path}/{child}")
            _fs.rename(spark, f"{stage}/{child}", f"{path}/{child}")
    _fs.delete(spark, stage)


def read_ivf_index(
    spark,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Open a persisted IVF index.  The centroid fetch is a bounded
    model-sized collect (``n_cells`` rows — like reading a watermark);
    the assignment frame stays lazy on the partitioned layout.  Opening
    self-heals a crashed :func:`recluster_ivf_index` swap first (same
    read-time contract as the BM25 and dedup indexes) — a probe opened
    after a recluster serves the NEW generation with no manual
    repoint."""
    _heal_ivf_recluster(spark, path)
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in cent_rows
    )
    assign = spark.read.parquet(f"{path}/assign").select(
        F.col("cell").cast("int").alias("cell"), id_col, vec_col
    )
    return IvfIndex(centroids=centroids, assign=assign)


def append_ivf_index(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: IvfIndex | None = None,
) -> IvfIndex:
    """Assign NEW vectors under the STORED centroids (the index never
    re-trains on append — cell identity must stay stable for existing
    partitions) and append them to the partitioned layout.  Map-only +
    partitioned append; existing partitions' files are untouched.

    Idempotency contract: plain at-least-once append (a replayed batch
    appends twice).  Deployments needing replay-safety follow the dedup
    index's pattern — tag batches and probe for the tag before appending
    (text/dedup.py ``_ib``); kept out of this layout to keep the probe
    path free of tag filters.

    ``index``: pass an already-open handle (e.g. the return of
    :func:`write_ivf_index`) to skip the centroid re-read — the append
    still assigns under exactly those stored centroids."""
    # Heal UNCONDITIONALLY before writing (r13 ADVICE): when an open
    # ``index=`` handle is passed, a crashed recluster may have left a
    # committed _recluster_stage — without the heal the append lands in
    # the doomed live assign dir and the next read-time heal deletes it.
    # A passed handle predates any stage that existed here, so if one
    # did, its centroids may be the replaced generation's: drop it and
    # re-open against the healed layout.
    from .. import fs as _fs

    had_stage = _fs.exists(spark, f"{path}/_recluster_stage")
    _heal_ivf_recluster(spark, path)
    if had_stage:
        index = None
    idx = index if index is not None else read_ivf_index(
        spark, path, id_col, vec_col
    )
    assigned = ivf_assign(
        new_df, idx.centroids, id_col, vec_col, cell_col="cell"
    )
    assigned.select("cell", id_col, vec_col).write.mode(
        "append"
    ).partitionBy("cell").parquet(f"{path}/assign")
    return read_ivf_index(spark, path, id_col, vec_col)


def ivf_index_cell_audit(
    spark,
    path: str,
    max_ratio: float = 4.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-health audit (r12, r11 VERDICT #6): cells whose population
    exceeds ``max_ratio`` x the mean cell size.  Appends assign under
    the FROZEN stored centroids, so a drifting corpus funnels new
    vectors into whichever cells its drift points at — one hot cell
    erodes the nprobe/n_cells per-probe read bound that makes the index
    worth having, and skews the decontam cell join.  Returns
    ``(cell, n_vectors, mean_cell, ratio)`` for over-ratio cells,
    largest first; a non-empty result is the signal to RE-CLUSTER
    (rebuild via :func:`write_ivf_index` with fresh
    :func:`kmeans_fit` centroids — cell ids are not stable across the
    rebuild, which is why appends never do this implicitly).  Cost: one
    count aggregation over the partition column — partition-pruned
    columnless scan.  The BM25 index's term-audit analog."""
    counts = (
        spark.read.parquet(f"{path}/assign")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    mean = counts.agg(
        F.avg("n_vectors").alias("mean_cell")
    )
    return (
        counts.crossJoin(F.broadcast(mean))
        .withColumn(
            "ratio",
            F.round(F.col("n_vectors") / F.col("mean_cell"), 3),
        )
        .filter(F.col("ratio") > float(max_ratio))
        .select(
            F.col("cell").cast("int").alias("cell"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.round("mean_cell", 3).alias("mean_cell"),
            "ratio",
        )
        .orderBy(F.col("ratio").desc(), "cell")
    )


def recluster_ivf_index(
    spark,
    src_path: str,
    dst_path: str | None = None,
    n_cells: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Remediate an :func:`ivf_index_cell_audit` hit: rebuild the index
    with FRESH centroids trained (Lloyd k-means, :func:`kmeans_fit`) on
    the STORED vectors — the corpus is never re-read; the one wide pass
    is the k-means rounds over the assign table plus the partitioned
    rewrite.

    ``dst_path=None`` (default, r12 VERDICT #3) swaps IN PLACE with the
    staged-generation lifecycle proven on
    :func:`~ssis_to_dbt_spark.text.retrieval.compact_bm25_index`: the
    new generation (assign + centroids) is fully written under
    ``{src_path}/_recluster_stage``, a ``_COMMIT`` marker lands after
    both writes return, then the stage renames over the live children.
    A crash at ANY point self-heals on the next
    :func:`read_ivf_index` — before the marker the partial stage is
    discarded (live untouched), after it the swap rolls forward — so a
    probe opened after a recluster always serves exactly one complete
    generation, with no manual repoint and no window where the index is
    missing.  Appends after the recluster assign under the NEW stored
    centroids (append re-reads ``{path}/centroids``).

    An explicit ``dst_path`` keeps the old copy-out behavior (new
    generation beside the old; caller repoints and reaps) for
    deployments whose probers hold long-lived open handles: cell ids
    are NOT stable across a re-cluster, so a handle opened before an
    in-place swap must not keep probing across it — re-open per batch
    (the streaming probes do) or use ``dst_path``."""
    from .. import fs as _fs

    _heal_ivf_recluster(spark, src_path)
    vecs = spark.read.parquet(f"{src_path}/assign").select(id_col, vec_col)
    cents = kmeans_fit(
        vecs, k=n_cells, rounds=rounds, id_col=id_col, vec_col=vec_col
    )
    if dst_path is not None:
        return write_ivf_index(
            vecs, dst_path, n_cells=n_cells, id_col=id_col,
            vec_col=vec_col, centroids=cents,
        )
    stage = f"{src_path}/_recluster_stage"
    _fs.delete(spark, stage)
    write_ivf_index(
        vecs, stage, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        centroids=cents,
    )
    _fs.touch(spark, f"{stage}/_COMMIT")
    _heal_ivf_recluster(spark, src_path)
    return read_ivf_index(spark, src_path, id_col, vec_col)


def route_queries(
    queries_df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int = 2,
    id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query top-``nprobe`` centroid cells, fully in-plan (map-only):
    each centroid similarity is a literal-array column, the per-query
    ranking is a sort of an ``n_cells``-element struct array (ties ->
    lowest cell id), and the probed cells explode to
    ``(query_id, embedding, cell)`` rows — ``nprobe`` rows per query, no
    shuffle, no driver round-trip per query."""
    q = _with_centroid_sims(queries_df, centroids, vec_col)
    ranked_sql = _ranked_cells_sql(centroids)
    probe_n = min(int(nprobe), len(centroids))
    return (
        q.selectExpr(
            _sql_ident(id_col),
            _sql_ident(vec_col),
            f"explode(slice({ranked_sql}, 1, {probe_n})) AS _c",
        )
        .selectExpr(
            _sql_ident(id_col),
            _sql_ident(vec_col),
            "CAST(-(_c.nc) AS INT) AS cell",
        )
    )


def route_queries_ranked(
    queries_df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`route_queries` at nprobe = n_cells, keeping the RANK of
    each probed cell: ``(id_col, vec_col, cell, crn)`` with ``crn`` = 1
    for the query's nearest centroid (same (sim desc, cell asc) order as
    ``route_queries``, so ``crn <= nprobe`` reproduces its probed-cell
    set exactly).  One map pass serves every nprobe arm of a recall
    audit — instead of one routing pass (plus its probed-cell-set
    action) per arm."""
    q = _with_centroid_sims(queries_df, centroids, vec_col)
    ranked_sql = _ranked_cells_sql(centroids)
    return (
        q.selectExpr(
            _sql_ident(id_col),
            _sql_ident(vec_col),
            f"posexplode({ranked_sql}) AS (_pos, _c)",
        )
        .selectExpr(
            _sql_ident(id_col),
            _sql_ident(vec_col),
            "CAST(-(_c.nc) AS INT) AS cell",
            "CAST(_pos + 1 AS INT) AS crn",
        )
    )


def ivf_probe_batch(
    index: IvfIndex,
    queries_df: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index with a BATCH of queries: route every
    query to its ``nprobe`` nearest cells (map-only), prune the
    assignment scan to the union of probed cells (a literal ``IN`` over
    the model-sized cell set -> PARTITION PRUNING on the on-disk
    layout), broadcast the routed queries against the surviving
    candidates on the cell key, and rank per query.

    Scores are round-6 quantized BEFORE the per-query top-k window
    (ties -> ascending ``vec_id``), so ranking is engine-portable.
    Each corpus vector lives in exactly ONE cell, so a (query, vector)
    pair appears at most once — no post-join dedup needed.

    Returns ``(query_id, vec_id, cosine_r, rn)``.

    100 TB shape: corpus-side work is a pruned scan of
    ``<= queries x nprobe`` partitions; the routed query table (queries
    x nprobe rows) broadcasts; the only exchange is the per-query
    top-k window's, which WindowGroupLimit caps at k rows per query per
    partition.  The routing stage runs ONCE (r12 VERDICT): when
    ``nprobe >= n_cells`` the prune is a no-op and is skipped outright
    (no action at all); otherwise the routed frame is
    ``localCheckpoint``ed lazily, so the cell-set collect materializes
    it and the join reuses the checkpointed blocks instead of
    re-running the full query-side routing map."""
    routed = route_queries(
        queries_df, index.centroids, nprobe, query_id_col, query_vec_col
    ).withColumnRenamed(query_vec_col, "_qv")
    if int(nprobe) >= len(index.centroids):
        cand = index.assign
    else:
        routed = routed.localCheckpoint(eager=False)
        cells = sorted(
            r["cell"] for r in routed.select("cell").distinct().collect()
        )
        cand = index.assign.filter(F.col("cell").isin(cells))
    joined = cand.join(F.broadcast(routed), "cell")
    cos_sql = _sql_cosine(
        _sql_as_double(_sql_ident(vec_col)), _sql_as_double("`_qv`")
    )
    scored = joined.selectExpr(
        _sql_ident(query_id_col),
        _sql_ident(id_col),
        f"round({cos_sql}, 6) AS cosine_r",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_r").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id_col,
            id_col,
            "cosine_r",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def ivf_probe_batch_arms(
    index: IvfIndex,
    queries_df: DataFrame,
    k: int = 10,
    nprobes: tuple[int, ...] = (2,),
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Several ``nprobe`` arms of :func:`ivf_probe_batch` from ONE scan
    (r14 perf): route once with cell ranks
    (:func:`route_queries_ranked`), scan the union of the LARGEST arm's
    probed cells once (the full assignment when that arm is
    nprobe >= n_cells), score each candidate once, then fan the scored
    rows into arms by ``crn <= nprobe`` and rank per (arm, query).

    Per arm, values are identical to ``ivf_probe_batch(nprobe=a)``: the
    ranked routing reproduces each arm's probed-cell set exactly, the
    cosine quantizes round-6 before the same (cosine desc, id asc)
    window, and each corpus vector lives in one cell so no dedup seam
    exists.  A caller running the same query batch at several prune
    levels (recall audits, full-vs-pruned comparison arms) pays one
    probe instead of one per arm.

    Returns ``(nprobe, query_id, vec_id, cosine_r, rn)``."""
    n_cells = len(index.centroids)
    arms = sorted({int(x) for x in nprobes})
    amax = min(arms[-1], n_cells)
    routed = route_queries_ranked(
        queries_df, index.centroids, query_id_col, query_vec_col
    ).withColumnRenamed(query_vec_col, "_qv")
    if amax < n_cells:
        # even the widest arm prunes: route once, collect the probed
        # cell set (<= queries x amax), partition-prune the scan
        routed = routed.filter(F.col("crn") <= amax).localCheckpoint(
            eager=False
        )
        cells = sorted(
            r["cell"] for r in routed.select("cell").distinct().collect()
        )
        cand = index.assign.filter(F.col("cell").isin(cells))
    else:
        cand = index.assign
    joined = cand.join(F.broadcast(routed), "cell")
    cos_sql = _sql_cosine(
        _sql_as_double(_sql_ident(vec_col)), _sql_as_double("`_qv`")
    )
    scored = joined.selectExpr(
        _sql_ident(query_id_col),
        _sql_ident(id_col),
        f"round({cos_sql}, 6) AS cosine_r",
        "crn",
    )
    fanned = scored.withColumn(
        "nprobe",
        F.explode(F.array(*[F.lit(a).cast("int") for a in arms])),
    ).filter(F.col("crn") <= F.least(F.col("nprobe"), F.lit(n_cells)))
    w = Window.partitionBy("nprobe", query_id_col).orderBy(
        F.col("cosine_r").desc(), F.col(id_col)
    )
    return (
        fanned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select(
            "nprobe",
            query_id_col,
            id_col,
            "cosine_r",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def nearest_reference(
    df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ref_id_col: str = "ref_id",
    ref_vec_col: str = "embedding",
    threshold: float | None = None,
) -> DataFrame:
    """Cross-set 1-NN: for every vector in ``df``, its single nearest
    vector in ``ref_df`` by cosine — the SEMANTIC DECONTAMINATION report
    (nearest eval/benchmark example per training item; flag items whose
    similarity crosses ``threshold``) and the retrieval-eval primitive
    (nearest labeled exemplar per candidate).

    Returns ``(id_col, ref_id_col, cosine_r)`` with ``cosine_r`` round-6
    quantized BEFORE the argmax (engine-portable ranking; ties -> lowest
    ref id), plus ``contaminated`` (int 0/1) when ``threshold`` is set.
    Rows of ``df`` always survive — an empty ``ref_df`` yields an empty
    result (no reference to compare against), never an error.

    100 TB shape: the REFERENCE side broadcasts (eval sets are
    model-sized — thousands of rows, not corpus-scale; for corpus-scale
    references use the IVF index probe instead, which bounds the scan at
    nprobe/n_cells), the corpus side is map-only through the
    BroadcastNestedLoopJoin, and the per-item argmax is a WindowGroupLimit
    row_number — k=1 rows per item cross the exchange."""
    ref = ref_df.select(
        F.col(ref_id_col) if ref_id_col in ref_df.columns
        else F.col(id_col).alias(ref_id_col),
        F.col(ref_vec_col).alias("_rv"),
    )
    cos_sql = _sql_cosine(
        _sql_as_double(_sql_ident(vec_col)), _sql_as_double("`_rv`")
    )
    scored = df.crossJoin(F.broadcast(ref)).selectExpr(
        _sql_ident(id_col),
        _sql_ident(ref_id_col),
        f"round({cos_sql}, 6) AS cosine_r",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine_r").desc(), F.col(ref_id_col)
    )
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if threshold is not None:
        out = out.withColumn(
            "contaminated",
            (F.col("cosine_r") >= float(threshold)).cast("int"),
        )
    return out


def semantic_decontam_indexed(
    df: DataFrame,
    index: "IvfIndex | str",
    threshold: float | None = None,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ref_id_col: str = "ref_id",
    index_id_col: str = "vec_id",
    index_vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-scale semantic decontamination THROUGH the persisted IVF
    index (r12, r11 VERDICT #5): :func:`nearest_reference` broadcasts
    the eval set, which caps it at model size.  Here the EVAL set lives
    in an IVF index (:func:`write_ivf_index` over the eval vectors) and
    the TRAINING corpus probes it WITHOUT broadcasting either side:

    1. route every training vector to its ``nprobe`` nearest eval cells
       — map-only, the centroids are a literal expression;
    2. prune the eval assignment scan to the union of probed cells (a
       bounded ``<= n_cells`` driver-side set -> PARTITION PRUNING on
       the on-disk layout);
    3. CELL-KEYED equi-join (an ordinary shuffle join — NO broadcast of
       the eval side, unlike :func:`ivf_probe_batch` which broadcasts
       the routed QUERY batch and is therefore the small-query-side
       tool) and per-item argmax.

    With ``nprobe >= n_cells`` the result is EXACTLY
    :func:`nearest_reference` (pytest- and oracle-pinned); smaller
    ``nprobe`` bounds per-item work at ``nprobe/n_cells`` of the eval
    set at the usual IVF recall trade.  A drifted/hot eval cell skews
    the cell join — AQE skew-join splits it at runtime, and
    :func:`ivf_index_cell_audit` reports imbalance before it hurts.

    ``index`` may be an open :class:`IvfIndex` or a path (opened with
    ``index_id_col``/``index_vec_col``).

    Returns ``(id_col, ref_id_col, cosine_r[, contaminated])`` —
    identical contract to :func:`nearest_reference`."""
    if isinstance(index, str):
        index = read_ivf_index(
            df.sparkSession, index, id_col=index_id_col,
            vec_col=index_vec_col,
        )
    routed = route_queries(
        df, index.centroids, nprobe, id_col, vec_col
    ).withColumnRenamed(vec_col, "_qv")
    # single routing pass (r12 VERDICT #1-wrong): the probing side here
    # is the CORPUS, so deriving the probed-cell set via an action must
    # not evaluate route_queries twice.  nprobe >= n_cells (the oracled
    # configuration) makes the prune a no-op — skip it with NO action;
    # otherwise lazily localCheckpoint the routed frame so the cell-set
    # collect materializes it once and the cell join reuses the blocks.
    cand = index.assign
    if int(nprobe) < len(index.centroids):
        routed = routed.localCheckpoint(eager=False)
        cells = sorted(
            r["cell"] for r in routed.select("cell").distinct().collect()
        )
        cand = cand.filter(F.col("cell").isin(cells))
    cand = cand.select(
        "cell",
        F.col(index_id_col).alias(ref_id_col),
        F.col(index_vec_col).alias("_rv"),
    )
    cos_sql = _sql_cosine(
        _sql_as_double("`_qv`"), _sql_as_double("`_rv`")
    )
    # plain equi-join on the cell key: Catalyst/AQE picks the physical
    # strategy; neither side carries a broadcast hint by design
    scored = routed.join(cand, "cell").selectExpr(
        _sql_ident(id_col),
        _sql_ident(ref_id_col),
        f"round({cos_sql}, 6) AS cosine_r",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine_r").desc(), F.col(ref_id_col)
    )
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if threshold is not None:
        out = out.withColumn(
            "contaminated",
            (F.col("cosine_r") >= float(threshold)).cast("int"),
        )
    return out


def ivf_recall_at_k(
    index: "IvfIndex",
    queries_df: DataFrame,
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2),
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
) -> DataFrame:
    """Recall@k audit (r13, r12 VERDICT #7): the operational dial that
    closes the index-health loop — :func:`ivf_index_cell_audit` says the
    cells have DRIFTED, this says what that drift (or an aggressive
    ``nprobe``) COSTS in answer quality, and
    :func:`recluster_ivf_index` remediates.  For each candidate
    ``nprobe``, probe a QUERY SAMPLE through the index and count, per
    query, how many of the exact top-``k`` neighbors (the
    ``nprobe = n_cells`` probe — pruning off, ranking identical) the
    pruned probe recovered.

    Returns ``(nprobe, query_id, n_hits, k)`` — exact integers, so the
    audit is oracle-checkable; recall@k per query is ``n_hits / k`` and
    the corpus-level dial is ``avg(n_hits) / k`` per nprobe.  Queries
    whose pruned probe finds none of the true neighbors still appear
    (``n_hits = 0``).

    Operational guidance: run the cell audit per append cycle; when it
    flags hot cells, run THIS on a held-out query sample — if recall at
    the production ``nprobe`` has sagged below target, re-cluster and
    re-measure (recall restores because fresh centroids re-balance the
    cells the drift crowded).  Raising ``nprobe`` buys recall linearly
    in scan cost; re-clustering buys it back for free at one rebuild.

    100 TB shape: the query side is a SAMPLE (model-sized by contract —
    this is an audit, not a serving path).  The audit's EXACT arm must
    scan the whole index by definition, so the fused form (r14 perf)
    routes once with cell ranks (:func:`route_queries_ranked`), joins
    the full assignment scan ONCE against the broadcast ranked routing,
    and derives every arm by ``crn <= nprobe`` + one shared per-(arm,
    query) top-k window — strictly fewer index bytes than per-arm
    probes (1 full scan, vs 1 full + sum(nprobe_i)/n_cells partial
    scans) and no per-arm routing actions.  Values are identical to
    per-arm :func:`ivf_probe_batch` calls: the ranked routing reproduces
    each arm's probed-cell set exactly, scores quantize round-6 before
    the same (cosine desc, id asc) window, and each corpus vector lives
    in one cell so no dedup seam exists.  The hit count joins per-query
    top-k relations — request-scale, never corpus-scale."""
    n_cells = len(index.centroids)
    arms = sorted({int(x) for x in nprobes})
    # internal arm set: always carry the exact arm (crn cap = n_cells)
    all_arms = sorted({min(a, n_cells) for a in arms} | {n_cells})
    routed = route_queries_ranked(
        queries_df, index.centroids, query_id_col, query_vec_col
    ).withColumnRenamed(query_vec_col, "_qv")
    joined = index.assign.join(F.broadcast(routed), "cell")
    cos_sql = _sql_cosine(
        _sql_as_double(_sql_ident(vec_col)), _sql_as_double("`_qv`")
    )
    scored = joined.selectExpr(
        _sql_ident(query_id_col),
        _sql_ident(id_col),
        f"round({cos_sql}, 6) AS cosine_r",
        "crn",
    )
    fanned = scored.withColumn(
        "_arm",
        F.explode(F.array(*[F.lit(a).cast("int") for a in all_arms])),
    ).filter(F.col("crn") <= F.col("_arm"))
    w = Window.partitionBy("_arm", query_id_col).orderBy(
        F.col("cosine_r").desc(), F.col(id_col)
    )
    topk = (
        fanned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(k))
        .select("_arm", query_id_col, id_col)
    )
    # the per-arm top-k relation feeds BOTH sides of the hit join;
    # checkpoint it so the fused index scan runs once, not once per
    # consumer (``checkpoint=False`` keeps the lazy plan for the
    # plan-shape tests, which pin the single-scan shape)
    if checkpoint:
        topk = topk.localCheckpoint(eager=False)
    exact = topk.filter(F.col("_arm") == n_cells).select(
        query_id_col, id_col
    )
    hits = (
        topk.join(exact, [query_id_col, id_col])
        .groupBy("_arm", query_id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.col("_arm").alias("_h_arm"),
            F.col(query_id_col).alias("_h_qid"),
            "n_hits",
        )
    )
    # requested arms as a pure-JVM literal explode (a 3-row
    # createDataFrame would spread over default-parallelism Python
    # partitions — one worker roundtrip per slice)
    qids = queries_df.select(query_id_col).distinct().select(
        query_id_col,
        F.explode(
            F.array(*[F.lit(a).cast("int") for a in arms])
        ).alias("nprobe"),
    )
    return (
        qids
        .join(
            hits,
            (F.least(F.col("nprobe"), F.lit(n_cells)) == F.col("_h_arm"))
            & (F.col(query_id_col) == F.col("_h_qid")),
            "left",
        )
        .select(
            F.col("nprobe").cast("int").alias("nprobe"),
            query_id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.lit(int(k)).cast("int").alias("k"),
        )
    )


def maintain_ivf_index(
    spark,
    path: str,
    queries_df: DataFrame | None = None,
    max_ratio: float = 4.0,
    k: int = 10,
    nprobe: int = 2,
    min_recall: float = 0.9,
    n_cells: int | None = None,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """One index-maintenance cycle (r13): the EXECUTABLE composition of
    the audit -> recall -> recluster loop the r12/r13 operators document.

    1. :func:`ivf_index_cell_audit` — no over-ratio cells -> ``{"action":
       "healthy"}``, nothing else runs.
    2. Hot cells + a ``queries_df`` sample -> :func:`ivf_recall_at_k` at
       the production ``nprobe``: if corpus recall@k still clears
       ``min_recall``, the drift isn't hurting answers yet ->
       ``{"action": "recall_ok"}`` (skip the rebuild, keep watching).
    3. Hot cells + (recall sagged OR no sample to check) ->
       :func:`recluster_ivf_index` IN PLACE (staged swap + crash heal),
       then re-measure recall on the new generation when a sample exists.

    Returns a driver-side report dict — every collect is bounded (audit
    rows <= n_cells; recall is one aggregate row per arm; the sample is
    model-sized by the audit contract).  Run it per append cycle or on
    an audit alert; probes opened after it (per-batch re-open, as the
    streaming probes do) serve whichever generation is live."""
    idx = read_ivf_index(spark, path, id_col, vec_col)
    cells = n_cells if n_cells is not None else len(idx.centroids)
    hot = ivf_index_cell_audit(
        spark, path, max_ratio=max_ratio, id_col=id_col, vec_col=vec_col
    ).collect()
    report: dict = {
        "hot_cells": [
            {"cell": r["cell"], "n_vectors": r["n_vectors"],
             "ratio": r["ratio"]}
            for r in hot
        ],
    }

    def _recall(index) -> float:
        # Rename the sample's id/vec columns to guaranteed-non-colliding
        # names before probing (r13 ADVICE): a sample taken straight off
        # the embeddings/assign frame carries the INDEX id column
        # (vec_id), and probing with query_id_col == id_col makes the
        # cell join self-ambiguous (AMBIGUOUS_REFERENCE).
        qid = id_col if id_col in queries_df.columns else "query_id"
        qvec = vec_col if vec_col in queries_df.columns else "embedding"
        sample = queries_df.select(
            F.col(qid).alias("__mq_id"), F.col(qvec).alias("__mq_vec")
        )
        rows = ivf_recall_at_k(
            index, sample, k=k, nprobes=(nprobe,),
            query_id_col="__mq_id", query_vec_col="__mq_vec",
            id_col=id_col, vec_col=vec_col,
        ).agg(
            (F.sum("n_hits") / (F.count(F.lit(1)) * F.lit(int(k))))
            .alias("r")
        ).first()
        return float(rows["r"]) if rows["r"] is not None else 1.0

    if not hot:
        report["action"] = "healthy"
        return report
    if queries_df is not None:
        before = _recall(idx)
        report["recall_before"] = round(before, 6)
        if before >= float(min_recall):
            report["action"] = "recall_ok"
            return report
    recluster_ivf_index(
        spark, path, n_cells=cells, rounds=rounds,
        id_col=id_col, vec_col=vec_col,
    )
    report["action"] = "reclustered"
    if queries_df is not None:
        report["recall_after"] = round(
            _recall(read_ivf_index(spark, path, id_col, vec_col)), 6
        )
    return report
