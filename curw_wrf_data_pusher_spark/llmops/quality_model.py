"""Model-based quality filtering: a hashed-unigram Naive Bayes
classifier trained and scored entirely with DataFrame aggregations.

Published analogue: the GPT-3 / CCNet / Gopher curation pipelines
train a linear (fasttext-style) classifier on (high-quality reference,
raw crawl) document pairs and keep crawl documents whose quality score
passes a threshold — the "model-based quality filter" stage that
heuristic stats (``textstats.quality_features``) cannot replace.
Multinomial Naive Bayes has a CLOSED-FORM maximum-likelihood fit —
per-class token-bucket counts with Laplace smoothing — so on Spark
training is ONE groupBy aggregation (no SGD, no driver iteration, no
MLlib dependency) and scoring is a broadcast join plus a per-document
sum.  Everything is deterministic and engine-portable (md5 bucket
hashing, log-ratio arithmetic), so the full train→score pipeline is
reproducible in ANSI SQL and hash-pinned by the driver oracle.

Scale (100 TB corpus):
- training: tokenization is map-side; the only shuffle is the
  ``n_buckets``-key count aggregation (map-side partial sums make the
  shuffle ≤ n_buckets rows per task regardless of corpus size).  The
  fitted model is n_buckets rows — kilobytes — collected never, and
  broadcast for scoring.
- scoring: token→bucket map-side, bucket→weight via a BROADCAST hash
  join (model is tiny by construction), then one shuffle on the doc id
  with map-side partial sums.  No global ops, no windows, no driver
  loops; class totals/priors are one bounded-metadata collect (4
  longs).
- hashing collisions: buckets deliberately collide (feature hashing,
  Weinberger et al. ICML'09); pick ``n_buckets`` ≥ a few × vocabulary
  for quality, memory stays O(n_buckets) either way.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class NBModel(NamedTuple):
    """A fitted hashed-unigram Naive Bayes quality model.

    ``weights`` is an (bucket, llr) DataFrame — the per-bucket
    log-likelihood ratio ln P(b|pos) − ln P(b|neg) under Laplace
    smoothing; ``prior_llr`` = ln(D_pos/D_neg); ``default_llr`` is the
    weight of a bucket never seen in training (a constant under
    smoothing: ln((T_neg + αB)/(T_pos + αB))).  ``weights`` is small
    (≤ n_buckets rows) and intended for broadcast."""

    weights: DataFrame
    prior_llr: float
    default_llr: float
    n_buckets: int
    alpha: float


def token_buckets(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    carry: Sequence[str] = (),
) -> DataFrame:
    """One row per token OCCURRENCE (multinomial NB counts repeats,
    unlike the distinct-shingle ops) with its hashed feature bucket.

    Tokenization matches the package convention (``trim`` + split on
    single space — see ``dedup.shingles``); the bucket is the engine-
    portable 32-bit md5 prefix mod ``n_buckets``.  Map-side only."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
        .cast("long") % F.lit(n_buckets)
    ).alias("bucket")
    return (
        docs.select(
            *[F.col(c) for c in carry],
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("token"),
        )
        .select(*[F.col(c) for c in carry], bucket)
    )


def train_quality_nb(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> NBModel:
    """Fit the classifier from (text, boolean label) rows; label true =
    the high-quality / target class.

    Closed-form: per-(bucket, class) token counts → smoothed
    log-likelihood ratios.  One wide aggregation (shuffle keyed on
    ``n_buckets`` values, map-side combined) plus one 4-value metadata
    collect for the class totals and document priors."""
    y = F.col(label_col).cast("boolean")
    tok = token_buckets(
        labeled.select(y.alias("__y"), F.col(text_col)),
        text_col=text_col,
        n_buckets=n_buckets,
        carry=("__y",),
    )
    # counts is <= n_buckets rows and feeds TWO consumers: the class-
    # totals collect below (an action at fit time) and the weights
    # frame broadcast at scoring time.  Without the checkpoint each
    # consumer re-ran the full corpus tokenize+hash+aggregate (two of
    # the query's three heavy scans); with it the totals action
    # materializes the bounded frame once and the broadcast reads it
    # back.
    counts = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("n_neg"),
    ).localCheckpoint(eager=False)
    # bounded metadata: token totals per class + document counts per
    # class (4 longs) — the standard "collect only aggregates" pattern
    t_pos, t_neg = counts.agg(
        F.sum("n_pos"), F.sum("n_neg")
    ).first()
    d_pos, d_neg = labeled.agg(
        F.sum(F.when(y, 1).otherwise(0)),
        F.sum(F.when(y, 0).otherwise(1)),
    ).first()
    if not (d_pos and d_neg):
        raise ValueError(
            "train_quality_nb: both classes must be non-empty "
            f"(got pos={d_pos}, neg={d_neg})"
        )
    b = float(n_buckets) * alpha
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("n_pos") + F.lit(alpha)) / F.lit(t_pos + b))
            - F.log((F.col("n_neg") + F.lit(alpha)) / F.lit(t_neg + b))
        ).alias("llr"),
    )
    import math

    return NBModel(
        weights=weights,
        prior_llr=math.log(d_pos / d_neg),
        default_llr=math.log((t_neg + b) / (t_pos + b)),
        n_buckets=n_buckets,
        alpha=alpha,
    )


def score_quality_nb(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: Sequence[str] = (),
) -> DataFrame:
    """Per-document quality score: ``prior_llr`` + Σ over token
    occurrences of the bucket's llr (unseen buckets contribute the
    constant ``default_llr``).  Positive score ⇒ the document looks
    more like the positive (high-quality) training class.

    Output: (id_col, *carry, n_tokens, score).  Plan: map-side
    tokenize/hash → broadcast join with the tiny weights frame → one
    doc-id shuffle with partial sums."""
    tok = token_buckets(
        docs, text_col=text_col, n_buckets=model.n_buckets,
        carry=(id_col, *carry),
    )
    joined = tok.join(F.broadcast(model.weights), "bucket", "left")
    return joined.groupBy(id_col, *carry).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.lit(model.prior_llr)
            + F.sum(F.coalesce(F.col("llr"), F.lit(model.default_llr)))
        ).alias("score"),
    )


def filter_by_quality(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
    acceptance: str = "threshold",
    salt: str = "quality:v1",
) -> DataFrame:
    """Keep documents the model rates above ``threshold``.

    ``acceptance='threshold'`` is the hard cut.  ``acceptance=
    'logistic'`` reproduces the GPT-3-style stochastic acceptance
    (keep a below-threshold document with probability
    sigmoid(score − threshold)) DETERMINISTICALLY: the coin flip is
    the md5-uniform of (salt, doc id), so reruns and repartitions keep
    the identical set — same device as ``curation.stratified_sample``.

    Returns the input columns plus ``score``; plan adds one broadcast
    join + one doc-id shuffle over the score subquery."""
    scored = score_quality_nb(docs, model, text_col=text_col, id_col=id_col)
    out = docs.join(
        scored.select(id_col, "score"), id_col, "inner"
    )
    if acceptance == "threshold":
        return out.filter(F.col("score") > F.lit(threshold))
    if acceptance != "logistic":
        raise ValueError(f"unknown acceptance mode: {acceptance!r}")
    u01 = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    p_keep = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("score") - F.lit(threshold)))
    )
    return out.filter(u01 < p_keep)
