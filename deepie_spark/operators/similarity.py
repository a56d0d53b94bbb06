"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path is
random-hyperplane LSH bucketing (deterministic seeded planes), which
turns the quadratic all-pairs problem into per-bucket local joins.

All dot products are ``zip_with`` + ``aggregate`` column expressions —
JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return dot(a, b) / (l2norm(a) * l2norm(b) + F.lit(1e-12))


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine against one query vector: a single
    scan + projection + global top-k (orderBy+limit -> TakeOrdered,
    no full sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = embeddings.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def pairwise_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors for each query row: broadcast the (small) query
    set against the big corpus, window top-k per query."""
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("qvec")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in {-1,+1}^dim derived
    from md5 — reproducible across sessions with no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()[0]
            row.append(1.0 if h % 2 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec_col, planes: list[list[float]]):
    """Bit-signature: sign of <v, plane_p> for each plane, packed into a
    bigint bucket id."""
    sig = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec_col, p) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("bigint")


def lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_signature(F.col(vec_col), _planes(dim, n_planes, seed)).alias("bucket"),
    )


def lsh_buckets_fast(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Arrow-batched numpy bucket assignment — the 100-TB fast path.

    The expression form (``lsh_buckets``) evaluates one interpreted
    ``aggregate`` lambda per plane per row (HOF lambdas never reach
    codegen): measured ~1.7 ms/vector at dim 64 x 8 planes — dead at
    10^9 vectors.  This kernel computes ALL plane dots as one
    [B, dim] @ [dim, n_planes] matmul per Arrow batch.  Same md5-seeded
    planes; float accumulation order differs from the left-to-right
    HOF expression, so a |dot| within float error of zero could flip a
    bucket bit — the fast path is therefore its own operator with its
    own python-twin oracle (``near_dup_lsh_fast``), exactly like
    ``minhash_signatures_fast`` vs the expression MinHash."""
    import numpy as np

    planes = np.array(_planes(dim, n_planes, seed), dtype=np.float64)  # [P,dim]
    weights = (2 ** np.arange(n_planes, dtype=np.int64))

    def kernel(it):
        import pandas as pd

        for pdf in it:
            if len(pdf):
                v = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                # broadcast-multiply + last-axis sum instead of a gemm:
                # per-row accumulation is then independent of the batch
                # shape (BLAS gemm may pick different kernels by M),
                # keeping results bit-identical across Arrow batch
                # sizes AND equal to the driver-side python twin
                dots = (v[:, None, :] * planes[None, :, :]).sum(axis=2)
                buckets = ((dots >= 0) * weights).sum(axis=1)
            else:
                buckets = []
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "bucket": buckets,
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} bigint, {vec_col} array<double>, bucket bigint"
    )


def cosine_pairs_kernel(threshold: float):
    """mapInPandas kernel factory: rows with (a, b, va, vb) -> scored
    pairs >= threshold, all dots as vectorized numpy (no per-row HOF)."""
    import numpy as np

    def kernel(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                yield pd.DataFrame({"a": [], "b": [], "score": []})
                continue
            va = np.vstack(pdf["va"].to_numpy()).astype(np.float64)
            vb = np.vstack(pdf["vb"].to_numpy()).astype(np.float64)
            dots = (va * vb).sum(axis=1)
            na = np.sqrt((va * va).sum(axis=1))
            nb = np.sqrt((vb * vb).sum(axis=1))
            score = dots / (na * nb + 1e-12)
            keep = score >= threshold
            yield pd.DataFrame(
                {
                    "a": pdf["a"].to_numpy()[keep],
                    "b": pdf["b"].to_numpy()[keep],
                    "score": score[keep],
                }
            )

    return kernel


def lsh_ann_pairs_fast(
    buckets: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Fast-path near-dup pairs: same capped bucket self-join shape as
    ``lsh_ann_pairs``, but pair scoring runs as one vectorized numpy
    pass instead of a per-pair interpreted cosine expression.

    ``buckets`` is persisted before fanning out (size agg + cap join +
    both self-join sides): exchange reuse does not cover all the
    duplicated subtrees, so without it the upstream bucket-assignment
    kernel re-reads and re-projects every embedding up to 3x per query
    (measured on the MinHash twin of this shape with a row-count
    accumulator).  Same rows either way; released by the
    ContextCleaner when the result is dropped."""
    from pyspark import StorageLevel

    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket is not None:
        sizes = buckets.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        buckets = (
            buckets.join(sizes, "bucket")
            .where(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n")
        )
    a = buckets.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket"
    )
    b = buckets.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb")
    )
    return pairs.mapInPandas(
        cosine_pairs_kernel(threshold), "a bigint, b bigint, score double"
    )


def ivf_train_centroids(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic mini-kmeans coarse quantizer (IVF training):
    centroids seeded from the k smallest xxhash64(id) rows, then
    ``iters`` Lloyd steps as DataFrame jobs (assign = argmin over the
    broadcast centroids, update = groupBy avg).  Driver holds only the
    k x dim centroid matrix."""
    seeds = (
        embeddings.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [list(map(float, r["v"])) for r in seeds]
    for _ in range(iters):
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
        rows = (
            assigned.groupBy("centroid_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.col(vec_col)[i]).alias(f"c{i}")
                        for i in range(len(centroids[0]))
                    ]
                ).alias("c")
            )
            .collect()
        )
        new = {r["centroid_id"]: [float(x) for x in r["c"]] for r in rows}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``centroid_id`` = argmax cosine over the broadcast centroid
    list — a struct-max over k column expressions, no UDF."""
    cands = [
        F.struct(
            cosine(F.col(vec_col), F.array(*[F.lit(x) for x in c])).alias("s"),
            F.lit(-i).alias("negi"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.greatest(*cands)
    return embeddings.withColumn("centroid_id", (-best["negi"]).cast("int"))


def ivf_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search over a LIVE frame: score only rows whose centroid is
    among the query's ``n_probe`` nearest.  Assignment is recomputed
    per query here; for the at-scale shape — assignment paid once,
    non-probed cells pruned at the scan — build a persisted index with
    :func:`ivf_pq_index` and query via :func:`ivf_pq_search`."""
    probes = _probe_cells(centroids, query, n_probe)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        assigned.where(F.col("centroid_id").isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def lsh_ann_pairs(
    buckets: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold, restricted to
    same-bucket candidates: the per-bucket self-join replaces the
    quadratic crossJoin (the 100-TB plan; recall tunable via n_planes
    and multi-probe).

    ``max_bucket`` caps degenerate buckets, mirroring
    ``dedup.lsh_candidate_pairs``: with few planes (256 buckets at 8
    planes) a near-dup-heavy corpus piles into a handful of buckets
    and the self-join group goes quadratic.  Bucket populations are
    counted first (one aggregation on the join key) and oversized
    buckets are dropped BEFORE the self-join, keeping pair generation
    linear in corpus size.  Recall tradeoff: every pair whose only
    shared bucket was capped is lost — raise ``max_bucket``, add
    planes (smaller buckets), or route capped buckets through exact
    dedup when recall matters; the adversarial all-one-bucket test
    pins the bounded-output behavior."""
    if max_bucket is not None:
        sizes = buckets.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        buckets = (
            buckets.join(sizes, "bucket")
            .where(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n")
        )
    a = buckets.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket"
    )
    b = buckets.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("score"))
        .where(F.col("score") >= threshold)
    )


# ---- product quantization (Jegou et al. 2011, public) ---------------------


def pq_train_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train PQ codebooks on a deterministic sample: split the vector
    into ``m`` subvectors and run a small seeded k-means per subspace.

    Classic product quantization (Jegou, Douze, Schmid: "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public):
    at 10^9+ vectors the float embeddings don't fit executor memory,
    but m log2(k)-bit codes do (64 float32 dims -> 8 bytes at m=8,
    k=256; 32x compression).  Training on a bounded sample is the
    standard recipe; the driver holds only the [m, k, dim/m] codebook
    tensor.  Sampling, init, and iteration are all deterministic
    (xxhash row order, numpy argmin ties to the lowest index)."""
    import numpy as np

    assert dim % m == 0, (dim, m)
    dsub = dim // m
    # md5-of-id sample order: computable identically in Spark, DuckDB,
    # and the python twin (xxhash64 would be Spark-only)
    rows = (
        embeddings.select(
            F.col(vec_col).alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    X = np.array([[float(x) for x in r["v"]] for r in rows], dtype=np.float64)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for sub in range(m):
        S = X[:, sub * dsub : (sub + 1) * dsub]
        cents = S[: k].copy()  # deterministic init: first k sample rows
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = S[mask].mean(axis=0)
        books[sub] = cents
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<int>[, *keep_cols]): nearest codebook entry per
    subspace — one Arrow-batched numpy pass, broadcast-multiply
    distances (no gemm, so results are batch-shape independent and
    twin-exact).  ``keep_cols`` pass through untouched (the index
    builder keeps ``centroid_id`` this way)."""
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)  # [m, k, dsub]
    m, k, dsub = books.shape
    keep_ddl = "".join(
        f", {c} {embeddings.schema[c].dataType.simpleString()}"
        for c in keep_cols
    )

    def kernel(it):
        import pandas as pd

        for pdf in it:
            if len(pdf):
                # one stacked [B, m, k, dsub] broadcast-distance pass per
                # Arrow batch instead of a python loop per row (the loop
                # was O(m*k) numpy dispatches PER VECTOR — interpreter-
                # bound at scale).  Twin-exact: the subtract/square/
                # last-axis sum runs the same per-element reduction
                # order as the per-row form, and argmin keeps the same
                # lowest-index tie rule, so codes are bit-identical to
                # the python twin regardless of batch shape.
                X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                codes = []
                # 128-row slices: the [B, m, k, dsub] temp stays ~1 MB
                # (cache-resident — swept 64..2048, 128 fastest; one
                # full-batch pass streams 16 MB temps through memory
                # and loses the win)
                for lo in range(0, len(X), 128):
                    S = X[lo : lo + 128]
                    d2 = ((S.reshape(len(S), m, 1, dsub) - books) ** 2).sum(axis=3)
                    codes.extend(d2.argmin(axis=2).astype(np.int32))
            else:
                codes = []
            out = {id_col: pdf[id_col], "codes": codes}
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col, *keep_cols).mapInPandas(
        kernel, f"{id_col} bigint, codes array<int>{keep_ddl}"
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks,
    query: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: the query builds an [m, k] lookup
    table of subspace distances once; each coded vector's approximate
    L2 distance is m table lookups + a sum (no float vectors touched).
    Returns (id, dist2) ascending via TakeOrdered."""
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = books.shape
    q = np.asarray(query, dtype=np.float64).reshape(m, 1, dsub)
    lut = ((q - books) ** 2).sum(axis=2)  # [m, k]

    def kernel(it):
        import pandas as pd

        rows_m = np.arange(m)
        for pdf in it:
            if len(pdf):
                # stacked [B, m] LUT gather + per-row sum (was a python
                # comprehension dispatching numpy per row).  Twin-exact:
                # each row sums its own m contiguous lookups in the
                # same order as the per-row form.
                C = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
                dists = lut[rows_m, C].sum(axis=1)
            else:
                dists = []
            yield pd.DataFrame({id_col: pdf[id_col], "dist2": dists})

    scored = codes_df.mapInPandas(kernel, f"{id_col} bigint, dist2 double")
    return scored.orderBy(F.asc("dist2"), F.asc(id_col)).limit(topk)


def ivf_pq_index(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build the PERSISTED IVF-PQ index: assign every vector to its
    coarse cell, PQ-encode it once, and write the (id, codes) table
    partitioned by ``centroid_id`` — one directory per cell.

    This is the missing build step round 4 flagged for
    ``ivf_topk``/``ivf_pq_topk``: those recompute the centroid argmax
    over the WHOLE table at every query.  With the index on disk,
    assignment and encoding are paid once at build time, queries read
    only the probed cells' directories (Spark partition pruning — the
    filter lands in PartitionFilters, plan-tested in
    test_similarity.py), and ranking touches m-int codes, never float
    vectors.  Iceberg/production analogue: a table partitioned by the
    coarse cell id with codes as a column; 10^9 vectors at m=8, k=16
    are ~8 GB of codes instead of ~256 GB of float32."""
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    coded = pq_encode(
        assigned, codebooks, id_col=id_col, vec_col=vec_col,
        keep_cols=("centroid_id",),
    )
    coded.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def _probe_cells(centroids: list[list[float]], query: list[float], n_probe: int) -> list[int]:
    """The query's ``n_probe`` nearest coarse cells by cosine (driver-
    side: k x dim floats)."""
    import math

    def cos_py(a, b):
        dot_ = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot_ / (na * nb + 1e-12)

    return sorted(
        range(len(centroids)), key=lambda i: -cos_py(centroids[i], query)
    )[:n_probe]


def ivf_pq_search(
    spark,
    path: str,
    centroids: list[list[float]],
    codebooks,
    query: list[float],
    topk: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the persisted IVF-PQ index: non-probed cells are pruned
    AT THE SCAN (the ``centroid_id IN (...)`` filter is a partition
    filter over the ``centroid_id=N`` directories — no file in a
    non-probed cell is opened), then PQ asymmetric distance ranks the
    survivors.  At full probe (n_probe = k) the result equals
    ``pq_adc_topk`` over the whole table (tested)."""
    probes = _probe_cells(centroids, query, n_probe)
    cells = spark.read.parquet(path).where(F.col("centroid_id").isin(probes))
    return pq_adc_topk(
        cells.select(id_col, "codes"), codebooks, query,
        topk=topk, id_col=id_col,
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks,
    query: list[float],
    topk: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse probe prunes cells, PQ asymmetric distance ranks
    inside them — the standard billion-scale ANN index composition
    (coarse quantizer + product codes, Jegou et al. 2011 §IV).  This
    form assigns + encodes per query over a live frame; the persisted
    shape — assignment and codes paid once at build, non-probed cells
    pruned at the scan — is :func:`ivf_pq_index` +
    :func:`ivf_pq_search`."""
    probes = _probe_cells(centroids, query, n_probe)
    cand = ivf_assign(embeddings, centroids, id_col, vec_col).where(
        F.col("centroid_id").isin(probes)
    )
    codes = pq_encode(cand, codebooks, id_col=id_col, vec_col=vec_col)
    return pq_adc_topk(codes, codebooks, query, topk=topk, id_col=id_col)
