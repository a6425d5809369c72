"""Similarity search over embedding columns (array<float>).

* **Brute-force cosine top-k** — the exact baseline: cross-join the
  (broadcast) query set against the corpus, dot/norm via
  ``zip_with`` + ``aggregate`` (JVM-side), ``row_number`` window for
  per-query top-k. Correctness oracle for everything else.
* **LSH-bucketed ANN (random hyperplanes)** — the scale path: sign of
  dot(v, h_i) over H deterministic hyperplanes gives an H-bit bucket
  code; probing compares only vectors sharing (possibly partial) codes.
  Hyperplane components derive from xxhash64(plane, dim) — fully
  deterministic, no stored model.
* **IVF-style partitioning** — coarse k-means-free variant: assign each
  vector to its max-|component| dimension bucket as a cheap routing key.
  (A true trained IVF needs an external model; this keeps the Spark
  plumbing — partition, route, local scan — with a deterministic router.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a, b):
    return _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12))


def brute_force_topk(corpus: DataFrame, queries: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "vec_id", k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors per query. The query side is
    broadcast (queries ≪ corpus); the corpus is scanned once. Ties break
    on neighbor id for determinism. Output (query_id, neighbor_id, cos)."""
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
                       .alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") <= k).drop("rn"))


def _hyperplane_bit(vec, plane: int) -> F.Column:
    """Sign bit of dot(vec, h_plane): h components are deterministic
    pseudo-gaussians from xxhash64(plane, dim) — no stored model."""
    prods = F.zip_with(
        vec,
        F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda i: (F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2001))
                               - F.lit(1000)).cast("double") / F.lit(1000.0)),
        lambda v, h: v * h)
    s = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket_code(vec, n_planes: int = 12) -> F.Column:
    code = F.lit(0)
    for p in range(n_planes):
        code = code * 2 + _hyperplane_bit(vec, p)
    return code


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 qid_col: str = "vec_id", k: int = 10,
                 n_planes: int = 10, n_tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates share a bucket code in ≥1 of
    n_tables independent hyperplane tables; exact cosine + top-k runs
    on candidates only. Bucket join replaces the cross join — the
    shuffle keys are (table, code) ints. Output like brute_force_topk."""
    def with_codes(df, idname):
        # per-table plane offset: shift the plane index space by t*n_planes
        codes = F.array(*[
            F.struct(F.lit(t).alias("t"),
                     _table_code(F.col("v"), t, n_planes).alias("code"))
            for t in range(n_tables)])
        return df.select(F.col(idname), F.col("v"),
                         F.explode(codes).alias("tc"))

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
    cb = with_codes(c, "neighbor_id")
    qb = with_codes(q, "query_id").withColumnRenamed("v", "qv")
    cands = (cb.join(qb, "tc")
               .where(F.col("neighbor_id") != F.col("query_id"))
               .select("query_id", "neighbor_id", "qv", "v")
               .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cands.select(
        "query_id", "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("v")), 6).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") <= k).drop("rn"))


def _table_code(vec, table: int, n_planes: int) -> F.Column:
    code = F.lit(0)
    for p in range(n_planes):
        code = code * 2 + _hyperplane_bit(vec, table * n_planes + p)
    return code


def ivf_route(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cheap deterministic coarse routing: bucket = argmax |component|.
    Adds 'ivf_bucket' int column; repartitioning by it co-locates
    similar-dominant-direction vectors for local scans."""
    v = F.col(vec_col).cast("array<double>")
    absv = F.transform(v, lambda x: F.abs(x))
    bucket = F.array_position(absv, F.array_max(absv)).cast("int")
    return df.withColumn("ivf_bucket", bucket)
