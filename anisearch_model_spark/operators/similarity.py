"""Similarity search over an embedding column (`array<float>`).

Replaces the reference's dense 1×N cosine kernel (``src/api.py:270-313``,
torch ``cos_sim`` against an in-memory matrix) with distributed variants:

  * ``cosine_topk`` — brute-force exact top-k: JVM-side ``zip_with`` +
    ``aggregate`` dot products in float64, ``ORDER BY ... LIMIT k`` →
    TakeOrderedAndProject (per-partition heap, no full sort).  The
    baseline and the oracle-checkable path.
  * ``RandomHyperplaneLSH`` — the scale path: seeded random-hyperplane
    sign buckets; probe only the query's bucket (+ optional 1-bit
    neighbors), exact cosine on candidates.  At 100 TB the bucket column
    is a partition key, so a query prunes to ~1/2^bits of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anisearch_model_spark.functions.windows import constant_partition


def _seqdot(a, b):
    """Sequential left-fold dot product — bit-identical to Spark's
    ``aggregate`` fold and to SQL ``sum(x*y ORDER BY i)`` (numpy's pairwise
    summation is NOT; driver-side constants embedded in oracle-mirrored
    expressions must use this)."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (rank, vec_id, cosine). Deterministic tie-break
    on vec_id asc; cosine rounded to 4dp (cross-engine comparability)."""
    q = [float(x) for x in query_vec]
    qnorm = float(np.sqrt(np.dot(q, q)))
    qlit = F.array(*[F.lit(x) for x in q])
    emb = _as_double(F.col(vec_col))
    dot = _dot(emb, qlit)
    dnorm = F.sqrt(_dot(emb, emb))
    scored = df.select(
        F.col(id_col).alias("vec_id"),
        F.round(dot / (dnorm * F.lit(qnorm)), 4).alias("cosine"),
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.partitionBy(constant_partition("vec_id")).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "vec_id", "cosine"
    )


# above this many embedded plan literals (dim × planes, or dim × lists)
# the expression form stops being sane: Catalyst compiles every
# coefficient into the projection (plan bloat, codegen limits), so the
# vectorized Arrow kernel with the matrix riding in the closure takes over.
# The literal path stays the default at test dims — it is what makes the
# DuckDB oracle mirror possible.
_MAX_PLAN_LITERALS = 4096


def _md5_sign(salt: str, p: int, i: int) -> float:
    """±1 Rademacher coefficient derived from md5 — deterministic AND
    reproducible in ANY engine with an md5 function (the same trick that
    made minhash oracle-checkable, operators/dedup.py)."""
    import hashlib

    h = hashlib.md5(f"{salt}:{p}:{i}".encode()).hexdigest()
    return 1.0 if h[0] in "89abcdef" else -1.0


class RandomHyperplaneLSH:
    """Sign-LSH index for approximate NN over array<float>.

    Hyperplane coefficients are ±1 (Rademacher) derived from
    ``md5(f"{seed}:{plane}:{dim}")`` — a symmetric random family (sign-LSH
    needs only symmetry, not Gaussianity) that a SQL oracle can reproduce
    exactly, unlike seeded-numpy Gaussians (round-1 verdict #4).

    ``fit`` MATERIALIZES (id, bucket, embedding) ``partitionBy(bucket)``;
    ``query_index`` then reads ONLY the candidate-bucket partitions
    (partition pruning — ~(n_planes+1)/2^n_planes of the data per
    multiprobe query).  ``transform``/``query`` are the index-free
    expression path (one full scan) used by stateless oracle entries.
    """

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.planes = np.array(
            [[_md5_sign(str(seed), p, i) for i in range(dim)]
             for p in range(n_planes)],
            dtype="float64",
        )

    def _bucket_expr(self, vec_col):
        emb = _as_double(F.col(vec_col))
        bits = []
        for p in range(self.n_planes):
            plane = F.array(*[F.lit(float(w)) for w in self.planes[p]])
            bits.append(F.when(_dot(emb, plane) >= 0, F.lit(1)).otherwise(F.lit(0)))
        bucket = F.lit(0)
        for p, bit in enumerate(bits):
            bucket = bucket + bit * F.lit(int(2**p))
        return bucket.cast("int")

    def transform(self, df: DataFrame, vec_col: str = "embedding",
                  use_pandas: bool | None = None) -> DataFrame:
        """Attach the sign-LSH ``bucket``.  At real embedding dims the
        expression form would embed dim × n_planes literals into the plan
        (768 × 8 = 6k coefficients compiled into one projection), so past
        ``_MAX_PLAN_LITERALS`` the bucket is computed by a vectorized
        Arrow kernel with the plane matrix in the task closure — same
        buckets, constant-size plan.  ``use_pandas`` forces either path
        (tests assert their equivalence)."""
        if use_pandas is None:
            use_pandas = self.dim * self.n_planes > _MAX_PLAN_LITERALS
        if not use_pandas:
            return df.withColumn("bucket", self._bucket_expr(vec_col))

        from pyspark.sql.types import IntegerType, StructField, StructType

        planes_t = self.planes.T.copy()  # (dim, n_planes)
        weights = (1 << np.arange(self.n_planes)).astype(np.int64)
        # fresh StructType: StructType.add MUTATES the frame's cached schema
        out_schema = StructType(
            list(df.schema.fields) + [StructField("bucket", IntegerType())]
        )

        def kernel(batches):
            for pdf in batches:
                pdf = pdf.copy()
                if len(pdf) == 0:
                    pdf["bucket"] = np.array([], dtype="int32")
                    yield pdf
                    continue
                v = np.array(
                    [np.asarray(x, dtype="float64") for x in pdf[vec_col]]
                )
                signs = (v @ planes_t) >= 0
                pdf["bucket"] = (signs * weights).sum(axis=1).astype("int32")
                yield pdf

        return df.mapInPandas(kernel, schema=out_schema)

    def query_bucket(self, query_vec: list[float]) -> int:
        signs = (self.planes @ np.asarray(query_vec, dtype="float64")) >= 0
        return int(sum(int(s) << p for p, s in enumerate(signs)))

    def query(
        self,
        df: DataFrame,
        query_vec: list[float],
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        multiprobe: bool = True,
    ) -> DataFrame:
        """(rank, vec_id, cosine) among candidate buckets only."""
        qb = self.query_bucket(query_vec)
        buckets = [qb] + (
            [qb ^ (1 << p) for p in range(self.n_planes)] if multiprobe else []
        )
        indexed = self.transform(df, vec_col)
        cands = indexed.filter(F.col("bucket").isin(buckets)).drop("bucket")
        return cosine_topk(cands, query_vec, k, id_col, vec_col)

    def fit(self, df: DataFrame, path: str, vec_col: str = "embedding") -> None:
        """Materialize the bucketed layout: one partition directory per
        bucket, so queries prune at the SCAN instead of re-hashing the
        whole table per query (the round-1 scale gap)."""
        self.transform(df, vec_col).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(path)

    def query_index(
        self,
        spark: SparkSession,
        path: str,
        query_vec: list[float],
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        multiprobe: bool = True,
    ) -> DataFrame:
        """(rank, vec_id, cosine) reading ONLY candidate-bucket partitions
        of a ``fit`` layout (bucket is a partition column → the IN filter
        becomes a PartitionFilter, pruning ~(1 - 9/256) of the files for
        the default 8-plane multiprobe)."""
        qb = self.query_bucket(query_vec)
        buckets = [qb] + (
            [qb ^ (1 << p) for p in range(self.n_planes)] if multiprobe else []
        )
        indexed = spark.read.parquet(path)
        cands = indexed.filter(F.col("bucket").isin(buckets)).drop("bucket")
        return cosine_topk(cands, query_vec, k, id_col, vec_col)


class IVFIndex:
    """Inverted-file (coarse-quantizer) ANN — the other classic scale path
    next to sign-LSH.

    Centroids are the embeddings of ``n_lists`` deterministic seed ids
    (the smallest ids in the table) — a pure function of the data that a
    SQL oracle reproduces exactly, unlike k-means with RNG init.  A Lloyd
    refinement step is available (``refine=N``) for real deployments;
    oracle-checked entries use refine=0.

    ``fit`` materializes (id, list_id, embedding) ``partitionBy(list_id)``
    — assignment is argmax cosine against the broadcast centroids, one
    narrow map over the table.  ``query`` probes the ``nprobe`` centroids
    closest to the query vector and exact-reranks only those partitions:
    the scan prunes to ~nprobe/n_lists of the data.
    """

    def __init__(self, n_lists: int = 16, nprobe: int = 4):
        self.n_lists = n_lists
        self.nprobe = nprobe
        self.centroids: list[tuple[int, list[float]]] | None = None

    def _fit_centroids(self, df: DataFrame, id_col: str, vec_col: str,
                       refine: int = 0) -> None:
        seeds = (
            df.orderBy(F.asc(id_col)).limit(self.n_lists)
            .select(id_col, vec_col).collect()
        )
        cents = [[float(x) for x in r[vec_col]] for r in seeds]
        for _ in range(refine):
            assigned = self._assign(df, cents, id_col, vec_col)
            dim = len(cents[0])
            means = (
                assigned.groupBy("list_id")
                .agg(*[
                    F.avg(F.col(vec_col)[i]).alias(f"m{i}") for i in range(dim)
                ])
                .collect()
            )
            by_list = {int(r["list_id"]): [float(r[f"m{i}"]) for i in range(dim)]
                       for r in means}
            cents = [by_list.get(j, cents[j]) for j in range(self.n_lists)]
        self.centroids = list(enumerate(cents))

    def _assign(self, df: DataFrame, cents: list[list[float]], id_col: str,
                vec_col: str, use_pandas: bool | None = None) -> DataFrame:
        """argmax-cosine list assignment (ties → lowest list_id), JVM-side:
        one array_max over the per-centroid cosine array.  Past
        ``_MAX_PLAN_LITERALS`` (dim × n_lists) the assignment runs as a
        vectorized Arrow kernel with the centroid matrix in the closure —
        identical list ids (same 6-dp half-up rounding, same first-max
        tie-break), constant-size plan."""
        import math

        dim = len(cents[0]) if cents else 0
        if use_pandas is None:
            use_pandas = dim * len(cents) > _MAX_PLAN_LITERALS
        if use_pandas:
            from pyspark.sql.types import IntegerType, StructField, StructType

            c_mat = np.array(cents, dtype="float64")  # (n_lists, dim)
            c_norm = np.array([math.sqrt(_seqdot(c, c)) for c in cents])
            out_schema = StructType(
                list(df.schema.fields) + [StructField("list_id", IntegerType())]
            )

            def kernel(batches):
                for pdf in batches:
                    pdf = pdf.copy()
                    if len(pdf) == 0:
                        pdf["list_id"] = np.array([], dtype="int32")
                        yield pdf
                        continue
                    v = np.array(
                        [np.asarray(x, dtype="float64") for x in pdf[vec_col]]
                    )
                    vn = np.sqrt((v * v).sum(axis=1))
                    cos = (v @ c_mat.T) / (vn[:, None] * c_norm[None, :])
                    # Spark ROUND is HALF_UP (away from zero) — replicate
                    # exactly so the boundary ties match the literal path
                    cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
                    pdf["list_id"] = cos.argmax(axis=1).astype("int32")
                    yield pdf

            return df.mapInPandas(kernel, schema=out_schema)

        emb = _as_double(F.col(vec_col))
        norm = F.sqrt(_dot(emb, emb))
        cos_arr = F.array(*[
            F.round(_dot(emb, F.array(*[F.lit(float(x)) for x in c]))
                    / (norm * F.lit(math.sqrt(_seqdot(c, c)))), 6)
            for c in cents
        ])
        best = F.array_max(cos_arr)
        list_id = F.array_position(cos_arr, best) - 1  # first max → lowest id
        return df.withColumn("list_id", list_id.cast("int"))

    def fit(self, df: DataFrame, path: str, id_col: str = "vec_id",
            vec_col: str = "embedding", refine: int = 0) -> None:
        self._fit_centroids(df, id_col, vec_col, refine)
        self._assign(df, [c for _j, c in self.centroids], id_col, vec_col) \
            .write.mode("overwrite").partitionBy("list_id").parquet(path)

    def _probe_lists(self, query_vec: list[float]) -> list[int]:
        import math

        q = [float(x) for x in query_vec]
        qn = math.sqrt(_seqdot(q, q))
        sims = [
            (round(_seqdot(q, c) / (qn * math.sqrt(_seqdot(c, c))), 6), -j)
            for j, c in self.centroids
        ]
        order = sorted(sims, reverse=True)  # cosine desc, list_id asc
        return [-nj for _s, nj in order[: self.nprobe]]

    def query_index(self, spark: SparkSession, path: str,
                    query_vec: list[float], k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
        """Exact top-k among the nprobe closest lists only (the list_id IN
        filter is a PartitionFilter on the fit layout)."""
        lists = self._probe_lists(query_vec)
        cands = spark.read.parquet(path).filter(
            F.col("list_id").isin(lists)
        ).drop("list_id")
        return cosine_topk(cands, query_vec, k, id_col, vec_col)

    def query(self, df: DataFrame, query_vec: list[float], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
        """Index-free expression path (stateless oracle entries): assign
        on the fly, filter to the probed lists, exact rerank."""
        assert self.centroids is not None, "call _fit_centroids/fit first"
        lists = self._probe_lists(query_vec)
        assigned = self._assign(df, [c for _j, c in self.centroids],
                                id_col, vec_col)
        cands = assigned.filter(F.col("list_id").isin(lists)).drop("list_id")
        return cosine_topk(cands, query_vec, k, id_col, vec_col)
