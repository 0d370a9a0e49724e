"""Approximate-nearest-neighbour search over an embedding column.

Baseline: brute-force cosine top-k (exact; one pass, no shuffle beyond
the top-k aggregation). Scale paths: (a) pivot-signature LSH — bucket
by the sign pattern of dot products against P pivot vectors
(deterministic: the first P dataset vectors), search the query's
bucket (single-probe) or its least-confident Hamming-1 neighbors too
(multi-probe); (b) IVF — coarse-quantize to the nearest of C data-
derived centroids and probe the nprobe lists nearest the query. All
stay JVM-side (aggregate/zip_with higher-order functions); no UDFs.

At 100 TB the brute-force variant is a full scan per query — fine for
batch scoring (it vectorizes and prunes to one column), while the
bucketed variant cuts candidates by ~2^P for online lookups.
`random_projection` is the pre-ANN compression step: JL sign-matrix
projection in exact micro-integer arithmetic (engine-portable,
shuffle-order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")


def _uniform_dim(vecs: list[list[float]]) -> int | None:
    """The common dimensionality of a driver-side vector list, or None
    when ragged/empty — gate for the codegen fast paths below."""
    dims = {len(v) for v in vecs}
    if len(dims) == 1:
        d = dims.pop()
        return d if d >= 1 else None
    return None


def _dot_fixed(a: str, b: str, d: int) -> F.Column:
    """dot(a, b) for two array columns KNOWN to both have size d —
    the same left-associative ((0 + p1) + p2) + ... float fold as the
    interpreted `aggregate(zip_with(...))` in `_dot` (bit-identical
    result), but as a flat expression tree that whole-stage codegen
    compiles (higher-order functions are CodegenFallback — interpreted
    per row — which made the pair stages of semantic_dedup and
    ivf_assign the hottest code in the engine; guide §4.1: prefer
    built-ins/codegen over interpreted paths)."""
    acc: F.Column = F.lit(0.0)
    for i in range(1, d + 1):
        acc = acc + F.expr(f"element_at({a}, {i})") * F.expr(f"element_at({b}, {i})")
    return acc


# NOTE: a per-pair CASE guard combining _dot_fixed with the
# interpreted _dot fallback was tried and removed: a CodegenFallback
# subtree inside a join condition costs the whole stage its codegen
# (measured 2x slower than the fixed path alone). Callers that need
# both paths split ROWS once per side instead (see
# dedup.semantic_dedup's size(v)==d split).


def _norm(a: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate({a}, 0D, (acc, x) -> acc + x * x)"))


def _safe_cosine(v: str, q: str, qn: F.Column | None = None) -> F.Column:
    """cosine(v, q) with the zero-norm contract: NULL when either norm
    is 0 — under ANSI mode a bare division throws divideByZeroError, so
    ONE zero embedding would otherwise kill a whole-corpus job (found
    by the adversarial-corpus fuzz). NULLs sort last in the top-k."""
    qn = _norm(q) if qn is None else qn
    denom = _norm(v) * qn
    return F.when(denom > 0, F.round(_dot(v, q) / denom, 6))


def with_query(emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float]) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("q", q)


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to query_vec.
    Deterministic order: (-cosine, id). Top-k via sort+limit — Spark
    plans this as TakeOrderedAndProject (per-partition heap + driver
    merge), no full sort, no full shuffle."""
    scored = with_query(emb, id_col, vec_col, query_vec).select(
        F.col("id").alias(id_col),
        _safe_cosine("v", "q").alias("cosine"),
    )
    return scored.orderBy(F.desc_nulls_last("cosine"), F.asc(id_col)).limit(k)


def pivot_signature(emb: DataFrame, id_col: str, vec_col: str, pivots: list[list[float]]) -> DataFrame:
    """Bucket id = concatenated signs of dot(v, pivot_i). Pivots are
    data-derived (first P vectors) so Spark and the SQL oracle agree."""
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    sig = F.concat(
        *[
            (_dot("v", f"array({','.join(f'{x!r}D' for x in p)})") >= 0).cast("int").cast("string")
            for p in pivots
        ]
    )
    return v.withColumn("bucket", sig)


def bucketed_ann(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = 10,
) -> DataFrame:
    """LSH-bucketed ANN: restrict to the query's pivot-sign bucket, then
    exact cosine rerank. Recall < 1 by construction (approximate)."""
    import math

    qsig = "".join(
        "1" if sum(a * b for a, b in zip(query_vec, p)) >= 0 else "0" for p in pivots
    )
    bucketed = pivot_signature(emb, id_col, vec_col, pivots).where(F.col("bucket") == qsig)
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    qn = math.sqrt(sum(x * x for x in query_vec))
    scored = bucketed.withColumn("q", q).select(
        F.col("id").alias(id_col),
        _safe_cosine("v", "q", F.lit(qn)).alias("cosine"),
    )
    return scored.orderBy(F.desc_nulls_last("cosine"), F.asc(id_col)).limit(k)


def _lit_vec(p: list[float]) -> str:
    return f"array({','.join(f'{x!r}D' for x in p)})"


def _sq_l2(a: str, p: list[float]) -> F.Column:
    """Squared L2 distance to a literal centroid (sqrt skipped — only
    the ordering matters and square is monotone)."""
    return F.expr(
        f"aggregate(zip_with({a}, {_lit_vec(p)}, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
    )


def ivf_assign(
    emb: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (first index on ties — matches the oracle's row_number
    order). Per-row argmin over an array of codegen'd distance
    expressions: no crossJoin against the centroid table, no shuffle,
    no UDF. Centroids are data-derived (caller picks seeds or k-means
    output) so Spark and the SQL oracle agree bit-for-bit.

    At scale: C centroids (typically sqrt(N), e.g. 2^10-2^14) live in
    the plan as literals/broadcast; assignment is embarrassingly
    parallel; write the output partitioned BY centroid so each probe
    reads only its lists (partition pruning does IVF's inverted-list
    seek)."""
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    # NOTE: the per-centroid distances deliberately stay as the
    # interpreted higher-order fold: expanding C x d literal terms
    # (tried in round 7) produced megabyte expression trees that the
    # optimizer then DUPLICATED into pushed-down isnotnull filters —
    # planning cost alone exceeded the interpreted evaluation. The
    # assignment runs once per ROW (not per pair), so it is never the
    # hot path; the pair-stage dot in semantic_dedup is (see
    # _dot_fixed and the size-split there).
    ds = F.array(*[_sq_l2("v", c) for c in centroids])
    return v.withColumn(
        "centroid", (F.array_position(ds, F.array_min(ds)) - 1).cast("int")
    )


def ivf_train(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    iters: int = 2,
) -> list[list[float]]:
    """Lloyd's k-means for the IVF coarse quantizer, done relationally:
    seed with the first C vectors (deterministic), then per iteration
    assign (per-row argmin, no shuffle) -> per-centroid per-dimension
    mean (posexplode + ONE groupBy on (centroid, dim), map-side
    partial agg) -> collect the C x d means to the driver (bounded:
    C*d doubles, independent of N). Empty clusters keep their previous
    centroid. This is the standard distributed k-means shape — state
    that crosses iterations is only the tiny centroid table."""
    from pyspark.sql import functions as _F

    centroids = [
        [float(x) for x in r["v"]]
        for r in emb.select(F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.col(id_col))
        .limit(n_centroids)
        .collect()
    ]
    for _ in range(iters):
        assigned = ivf_assign(emb, id_col, vec_col, centroids)
        means = (
            assigned.select("centroid", _F.posexplode("v").alias("dim", "x"))
            .groupBy("centroid", "dim")
            .agg(_F.avg("x").alias("m"))
            .groupBy("centroid")
            .agg(_F.array_sort(_F.collect_list(_F.struct("dim", "m"))).alias("dm"))
            .select("centroid", _F.transform("dm", lambda s: s["m"]).alias("mean"))
            .collect()
        )
        new = list(centroids)
        for r in means:
            new[r["centroid"]] = [float(x) for x in r["mean"]]
        centroids = new
    return centroids


def ivf_distortion(
    emb: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> float:
    """Mean squared distance to the assigned centroid (training loss)."""
    assigned = ivf_assign(emb, id_col, vec_col, centroids)
    ds = F.array(*[_sq_l2("v", c) for c in centroids])
    return assigned.select(F.array_min(ds).alias("d")).agg(F.avg("d")).first()[0]


def ivf_ann(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search: probe the nprobe centroids nearest the query
    (driver-side — C is small), scan only vectors assigned to them,
    exact cosine rerank. The classic recall/cost dial: nprobe=C is
    exact; nprobe/C is the fraction of data scanned."""
    import math

    def sq_l2(a: list[float], b: list[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: (sq_l2(query_vec, centroids[i]), i))
    probes = order[:nprobe]
    assigned = ivf_assign(emb, id_col, vec_col, centroids).where(
        F.col("centroid").isin(probes)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    qn = math.sqrt(sum(x * x for x in query_vec))
    scored = assigned.withColumn("q", q).select(
        F.col("id").alias(id_col),
        _safe_cosine("v", "q", F.lit(qn)).alias("cosine"),
    )
    return scored.orderBy(F.desc_nulls_last("cosine"), F.asc(id_col)).limit(k)


def random_projection(
    emb: DataFrame, id_col: str, vec_col: str, out_dim: int
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a
    DETERMINISTIC sign matrix (Achlioptas 2003: entries in {+1, -1}
    preserve pairwise cosines in expectation) — the compression step a
    100 TB embedding corpus runs before ANN indexing (project 1024-d
    float vectors to out_dim, then bucket/IVF the small vectors).

    Engine-exact by the micro-integer discipline: inputs are 6-dp
    embeddings, so round(x * 1e6) is an EXACT int64, the sign s_ij
    derives from md5(i|j) parity (no RNG state), and y_j =
    sum_i round(x_i * 1e6) * s_ij is an integer sum — no float
    accumulation order anywhere, so any engine (and any shuffle
    order) produces bit-identical projections. The unscaled sum is
    deliberate: downstream cosine is scale-invariant, so the 1/sqrt(k)
    JL factor is a no-op for similarity search.

    Output (id, j, y_micro) long-form, one row per output coordinate —
    pure codegen (per-row sequence/zip_with/aggregate), no UDFs, no
    shuffle at all (explode of an out_dim-element array per row)."""
    if out_dim < 1:
        raise ValueError(f"random_projection: out_dim must be >= 1, got {out_dim}")

    def y(j: int) -> F.Column:
        return F.expr(
            f"aggregate(zip_with(cast({vec_col} as array<double>), "
            f"sequence(0, size({vec_col}) - 1), "
            "(x, i) -> cast(round(x * 1000000) as bigint) * "
            "(case when pmod(cast(conv(substr(md5(concat(cast(i as string), "
            f"'|', '{j}')), 1, 15), 16, 10) as bigint), 2) = 0 "
            "then 1 else -1 end)), "
            "0L, (acc, e) -> acc + e)"
        )

    # Codegen fast path (guide §4.1): the sign s_ij depends only on
    # (i, j), never on the row, so hoist the md5-parity matrix to the
    # driver (out_dim x d ints — tiny, same md5/conv/pmod arithmetic)
    # and emit the projection as a flat integer expression whole-stage
    # codegen compiles. The interpreted fold re-derived the md5 PER
    # ELEMENT PER ROW (d x out_dim md5 calls per row — the entire q108
    # cost). Rows whose size differs from the probed dimension keep the
    # interpreted fold; integer sums are order-exact either way, so
    # results are bit-identical.
    d_probe = None
    try:
        r = (
            emb.select(F.size(F.col(vec_col)).alias("_d"))
            .where(F.col("_d").isNotNull() & (F.col("_d") >= 1))
            .first()
        )
        d_probe = int(r["_d"]) if r is not None else None
    except Exception:
        d_probe = None

    def y_col(j: int) -> F.Column:
        if d_probe is None:
            return y(j)
        import hashlib

        acc: F.Column = F.lit(0).cast("long")
        for i in range(d_probe):
            par = (
                int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:15], 16) % 2
            )
            s = 1 if par == 0 else -1
            term = F.expr(
                f"cast(round(cast(element_at({vec_col}, {i + 1}) as double)"
                " * 1000000) as bigint)"
            ) * F.lit(s).cast("long")
            acc = acc + term
        return F.when(F.expr(f"size({vec_col})") == d_probe, acc).otherwise(y(j))

    arr = F.array(
        *[
            F.struct(F.lit(j).alias("j"), y_col(j).alias("y_micro"))
            for j in range(out_dim)
        ]
    )
    return emb.select(F.col(id_col).alias("id"), F.explode(arr).alias("p")).select(
        "id", "p.j", "p.y_micro"
    )


def query_signature(query_vec: list[float], pivots: list[list[float]]) -> str:
    return "".join(
        "1" if sum(a * b for a, b in zip(query_vec, p)) >= 0 else "0" for p in pivots
    )


def multiprobe_buckets(
    query_vec: list[float], pivots: list[list[float]], n_probes: int
) -> list[str]:
    """Probe sequence: the query's own bucket, then Hamming-1 neighbors
    ordered by |dot(q, pivot_i)| ascending — flip the LEAST confident
    sign first (the standard multi-probe LSH heuristic: a point near a
    pivot hyperplane is the likeliest to have landed on the other
    side). Driver-side: P is small (8-32), the bucket list is tiny."""
    base = query_signature(query_vec, pivots)
    margins = sorted(
        range(len(pivots)),
        key=lambda i: abs(sum(a * b for a, b in zip(query_vec, pivots[i]))),
    )
    probes = [base]
    for i in margins:
        flipped = base[:i] + ("0" if base[i] == "1" else "1") + base[i + 1 :]
        probes.append(flipped)
    return probes[:n_probes]


def bucketed_ann_multiprobe(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = 10,
    n_probes: int = 3,
) -> DataFrame:
    """Multi-probe LSH ANN: scan the query's bucket PLUS its least-
    confident Hamming-1 neighbors (n_probes total), exact cosine
    rerank. Recovers most of the recall a single probe loses at the
    cost of n_probes/2^P of the data scanned — the standard trade for
    one table instead of L independent tables (same memory as single-
    probe). Still one scan with an IN filter; no shuffle, no UDF."""
    import math

    probes = multiprobe_buckets(query_vec, pivots, n_probes)
    bucketed = pivot_signature(emb, id_col, vec_col, pivots).where(
        F.col("bucket").isin(probes)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    qn = math.sqrt(sum(x * x for x in query_vec))
    scored = bucketed.withColumn("q", q).select(
        F.col("id").alias(id_col),
        _safe_cosine("v", "q", F.lit(qn)).alias("cosine"),
    )
    return scored.orderBy(F.desc_nulls_last("cosine"), F.asc(id_col)).limit(k)
