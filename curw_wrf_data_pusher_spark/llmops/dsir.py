"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram profile
looks like a small high-quality TARGET domain, by importance weights
under bag-of-hashed-ngrams models of target vs raw.

Pipeline (all shapes published in the paper):
1. features: every document's unigrams + bigrams hash into B buckets
   (B fixed and small, 10^4 in the paper — bounded by construction);
2. models: bucket count tables for the target subset and the raw
   corpus (Laplace-smoothed multinomials);
3. log importance weight per document:
       log w_d = sum_b c_db * [ln p_t(b) - ln p_r(b)]
4. resampling: Gumbel-top-k over log w (temperature 1), which samples
   WITHOUT replacement proportionally to w — or deterministic top-k.

Exactness strategy (matches the repo's oracle discipline):
- everything integer is exact end-to-end: bucket counts, per-document
  feature counts, and the registered invariants (dot products of the
  doc feature vector against both count tables, unseen-mass counts);
- the float log-weight folds per-document in BUCKET-SORTED order
  (bit-reproducible across partitionings, same device as
  ``retrieval._sorted_fold_sum``) and is rounded to 9 dp — the same
  contract ``llm_ngram_logfreq`` already pins cross-engine;
- the Gumbel keys are md5-uniform (portable, seedable) — the
  resample is deterministic given the seed and numpy-mirrorable.

Scale design: the feature explode is map-side; per-document bucket
counts are ONE uniform (id, bucket) shuffle; the model tables are
B rows (merge-small after agg) and join the per-doc frame on the
bucket key — B is a config constant, so AQE broadcasts the model
side on its own measurement (no unbounded broadcast hints).  Nothing
collects driver-side except the two scalar totals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .retrieval import _sorted_fold_sum
from .textkeys import gram_hash_sql, tokenize


def _bucket(gram_expr: str, buckets: int) -> str:
    """Portable bucket id: the shared 32-bit gram hash mod B
    (SQL-string form so it can run inside transform lambdas)."""
    return f"{gram_hash_sql(gram_expr)} % {buckets}"


def hashed_ngram_features(
    docs: DataFrame,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document hashed bag-of-ngrams: (id, bucket, c) with c the
    exact occurrence count of unigrams + bigrams hashing to that
    bucket.  Map-side explode, one (id, bucket) shuffle."""
    # (split of a trimmed string is never empty, so no size filter)
    tok = tokenize(docs, id_col, text_col)
    uni = _bucket("x", buckets)
    big = _bucket("__t[i] || ' ' || __t[i + 1]", buckets)
    grams = tok.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.expr(f"transform(__t, x -> {uni})"),
                F.expr(
                    "case when size(__t) >= 2 then "
                    f"transform(sequence(0, size(__t) - 2), i -> {big}) "
                    "else array() end"
                ),
            )
        ).alias("bucket"),
    )
    return grams.groupBy(id_col, "bucket").agg(F.count("*").alias("c"))


def dsir_bucket_models(
    feats: DataFrame, target_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Bucket count tables for raw (= every doc in ``feats``) and
    target (= docs in ``target_ids``): (bucket, tc, rc).  One B-row
    aggregate; the target membership arrives as a LEFT SEMI-style
    flag join so the target need not be a column of the corpus."""
    flagged = feats.join(
        target_ids.select(F.col(id_col), F.lit(1).alias("__is_t")),
        id_col,
        "left",
    )
    return flagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_t") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("tc"),
        F.sum("c").cast("long").alias("rc"),
    )


def dsir_log_weights(
    feats: DataFrame,
    models: DataFrame,
    t_total: int,
    r_total: int,
    buckets: int,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    score_scale: int = 9,
) -> DataFrame:
    """Per-document log importance weight plus the exact integer
    invariants: (id, n_grams, dot_t, dot_r, unseen_t, logw).

    logw = sum_b c_db * ln( ((tc_b+a)/(T+aB)) / ((rc_b+a)/(R+aB)) )
    folded in bucket-sorted order and rounded to ``score_scale`` —
    the bit-reproducible float contract; dot_t / dot_r / unseen_t are
    pure BIGINT (the oracle-exact part)."""
    # single-ln shape: ln of one double ratio per bucket (same
    # expression tree on the DuckDB side keeps ulp behavior aligned)
    ratio = (
        (F.col("tc") + F.lit(alpha))
        * F.lit(float(r_total) + alpha * buckets)
    ) / (
        (F.col("rc") + F.lit(alpha))
        * F.lit(float(t_total) + alpha * buckets)
    )
    j = feats.join(models, "bucket").select(
        F.col(id_col),
        "bucket",
        "c",
        "tc",
        "rc",
        (F.col("c") * F.log(ratio)).alias("contrib"),
    )
    return j.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.sum(F.col("c") * F.col("tc")).cast("long").alias("dot_t"),
        F.sum(F.col("c") * F.col("rc")).cast("long").alias("dot_r"),
        F.sum(F.when(F.col("tc") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("unseen_t"),
        # the shared bit-reproducible bucket-sorted fold (see
        # retrieval._sorted_fold_sum — one definition for every
        # cross-engine float-sum contract)
        _sorted_fold_sum(score_scale, key_col="bucket", val_col="contrib")
        .alias("logw"),
    )


def gumbel_key(logw: Column, id_col: Column, seed: str) -> Column:
    """Seeded Gumbel perturbation: logw - ln(-ln(u)) with u the
    md5-uniform of (seed, id) — the Gumbel-top-k trick samples k docs
    without replacement with probability proportional to exp(logw).
    Portable and deterministic (numpy-mirrorable)."""
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(seed), id_col)), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    # clamp away exact 0 (md5 prefix all-zero) so ln stays finite
    u = F.greatest(u, F.lit(1e-18))
    return logw - F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: str = "dsir-v1",
    id_col: str = "doc_id",
    deterministic: bool = False,
) -> DataFrame:
    """Select k documents: Gumbel-top-k over logw (the paper's
    sampler), or the deterministic top-k when ``deterministic``.
    TakeOrdered path (per-partition heaps) — no global sort shuffle;
    id tie-break keeps the selection total-ordered."""
    key = (
        F.col("logw")
        if deterministic
        else gumbel_key(F.col("logw"), F.col(id_col), seed)
    )
    return (
        weights.select(*weights.columns, key.alias("__key"))
        .orderBy(F.desc("__key"), F.col(id_col))
        .limit(k)
        .drop("__key")
    )
