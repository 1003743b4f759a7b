"""End-to-end corpus curation: the composed pipeline a training-data
run executes, assembled entirely from this package's operators in
their production order —

    exact dedup → boilerplate-line removal → [repeated-span removal]
    → quality filter → MinHash-LSH near-dedup → benchmark
    decontamination → [span-level decontamination] → PII redaction →
    epoch-weighted mixing

(bracketed stages are opt-in via CurationConfig — they rewrite text
rather than drop documents, so a tuned run enables them explicitly)

Every stage is a lazy DataFrame transformation: composing all seven
builds ONE logical plan and Catalyst optimizes across stage
boundaries (e.g. the quality filter's column pruning reaches the
scan even though three stages intervene).  Nothing here collects,
counts, or checkpoints except what the underlying operators already
bound (`resolve_clusters`'s edge-list materialization).

The stage ORDER is the standard one and it matters at 100 TB:
cheap high-yield filters run first (exact dedup halves a crawl for
one hash shuffle) so the expensive stages (LSH fan-out, exact
Jaccard verify) see the smallest possible corpus; decontamination
runs after near-dedup so test-shingle joins don't pay for documents
that were about to be dropped anyway; redaction is map-only so its
placement barely matters, but running it after the drops avoids
rewriting text that never ships.

This is a beyond-reference surface: the reference engine
(wrf_data_pusher.py) has no corpus-curation path; each individual
operator cites its own provenance."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clusters import resolve_clusters
from .curation import (
    redact_pii,
    remove_duplicated_lines,
    shingle_contamination,
    upsample_by_group,
)
from .dedup import (
    lsh_candidate_pairs,
    minhash_signatures_from_text,
    shingles,
    verify_candidates,
)
from .textstats import dup_ngram_ratio_expr, text_features, token_count_expr  # noqa: F401


@dataclass(frozen=True)
class CurationConfig:
    """Thresholds for ``curate_corpus``; a ``None`` disables a stage.

    Defaults are deliberately mild — real corpora tune these per
    source (Gopher's rules are per-domain); the values only need to
    be sane, the *shape* of the pipeline is the product."""

    dedup_exact: bool = True
    boilerplate_min_dup: int | None = 2
    # repeated-window span removal (substrings.remove_duplicate_spans)
    # between boilerplate and the quality filter — off by default: the
    # line stage already covers classic boilerplate, and span removal
    # rewrites text, which a tuned run should opt into deliberately
    span_dedup_l_tokens: int | None = None
    span_dedup_min_count: int = 2
    # span-level decontamination (substrings.remove_contaminated_spans)
    # after the document-level stage: documents QUOTING a benchmark
    # item lose the quoted run instead of (or in addition to) being
    # dropped outright; requires test_docs
    span_decontaminate_l_tokens: int | None = None
    min_tokens: int | None = 5
    max_tokens: int | None = 1_000_000
    max_dup_2gram_ratio: float | None = 0.5
    neardup_jaccard: float | None = 0.8
    lsh_bands: int = 4
    lsh_rows_per_band: int = 2
    contamination_max: float | None = 0.2
    redact: bool = True
    mix_weights: dict[str, float] | None = None


def curate_corpus(
    docs: DataFrame,
    test_docs: DataFrame | None = None,
    config: CurationConfig = CurationConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    checkpoint_stages: bool = False,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Run the full curation pipeline over ``docs``; returns
    ``(final, stages)`` where ``stages`` maps each executed stage
    name to the corpus as it stood AFTER that stage.  Stages are
    lazy DataFrames — inspecting one executes only its prefix of the
    plan — with ONE exception: when ``neardup_jaccard`` is enabled,
    building the pipeline itself eagerly runs the prefix up through
    LSH-verify (``resolve_clusters`` localCheckpoints the edge list
    and iterates to convergence), so cluster jobs fire during
    construction, before any stage is inspected.

    ``test_docs`` (held-out benchmark documents, same id/text
    columns; ids must not collide with the corpus) enables the
    decontamination stage: a training document whose shingle overlap
    with the benchmark side exceeds ``contamination_max`` is dropped
    — note the direction, the TRAINING doc is removed, the benchmark
    is read-only.  This reuses ``shingle_contamination`` with the
    roles swapped: the flag marks the *training* side as "test" so
    the per-document overlap is computed for training docs against
    the benchmark shingle set.

    ``checkpoint_stages=True`` lazily ``localCheckpoint``s each stage
    frame: results are identical, but every stage's subtree executes
    at most ONCE even when several consumers reference it — the
    single-plan Catalyst cross-stage optimization is traded for
    materialized stage boundaries.  Off (the default), inspecting k
    stages re-executes each one's prefix (k² stage work);
    on, auditing every stage (``curation_report``) is linear.
    Measured honestly at sf0.1: a fresh build-and-report gains only
    ~8% (saved recomputes are mostly offset by materializing text
    frames per stage), but every SUBSEQUENT inspection in the same
    session — re-reports, per-stage drill-downs — reads the cached
    stage RDDs (~8.5 s → ~1 s).  Turn it on for audit loops, leave it
    off when only ``final`` is consumed."""
    stages: dict[str, DataFrame] = {}
    cur = docs

    def _stage(name: str, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=False) if checkpoint_stages else df
        stages[name] = out
        return out

    if config.dedup_exact:
        # keep the min-id representative of each exact content group;
        # window over the map-side hash — one shuffle, text never
        # shuffles twice
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5(F.col(text_col)))
        cur = (
            cur.withColumn("__canon", F.min(id_col).over(w))
            .filter(F.col(id_col) == F.col("__canon"))
            .drop("__canon")
        )
        cur = _stage("exact_dedup", cur)

    if config.boilerplate_min_dup is not None:
        cur = remove_duplicated_lines(
            cur,
            id_col=id_col,
            text_col=text_col,
            min_dup_count=config.boilerplate_min_dup,
        )
        cur = _stage("boilerplate", cur)

    if config.span_dedup_l_tokens is not None:
        from .substrings import remove_duplicate_spans

        cur = remove_duplicate_spans(
            cur,
            id_col=id_col,
            text_col=text_col,
            l_tokens=config.span_dedup_l_tokens,
            min_count=config.span_dedup_min_count,
        )
        cur = _stage("span_dedup", cur)

    if any(
        t is not None
        for t in (
            config.min_tokens,
            config.max_tokens,
            config.max_dup_2gram_ratio,
        )
    ):
        # Map-side filter on the shared feature EXPRESSIONS
        # (textstats.token_count_expr / dup_ngram_ratio_expr — the
        # same single definitions text_features projects), NOT a
        # semi-join of `cur` against text_features(cur): that
        # self-referential join duplicated the whole upstream subtree
        # (both join sides re-ran exact-dedup + boilerplate) and
        # computed all 15+ features when the predicate needs two.
        # Profiled at sf0.1: the join form made quality_filter the
        # most expensive stage of the pipeline (~+7 s); this form is
        # one codegen'd filter, and at 100 TB it removes a full extra
        # pass over the corpus.
        n_tok = token_count_expr(text_col)
        cond = F.lit(True)
        if config.min_tokens is not None:
            cond &= n_tok >= config.min_tokens
        if config.max_tokens is not None:
            cond &= n_tok <= config.max_tokens
        if config.max_dup_2gram_ratio is not None:
            # short docs have NULL ratio — they pass (length rules
            # already police them)
            ratio = dup_ngram_ratio_expr(text_col, 2)
            cond &= ratio.isNull() | (ratio <= config.max_dup_2gram_ratio)
        cur = cur.filter(cond)
        cur = _stage("quality_filter", cur)

    if config.neardup_jaccard is not None:
        # signatures map-only (zero shuffles); the shingle fan-out is
        # built too but only feeds the candidate-restricted verify
        sh = shingles(cur, text_col=text_col, id_col=id_col)
        sig = minhash_signatures_from_text(
            cur, text_col=text_col, id_col=id_col
        )
        cand = lsh_candidate_pairs(
            sig,
            id_col=id_col,
            bands=config.lsh_bands,
            rows_per_band=config.lsh_rows_per_band,
        )
        dup_pairs = verify_candidates(
            sh, cand, id_col=id_col, min_jaccard=config.neardup_jaccard
        ).select("id_a", "id_b")
        clusters = resolve_clusters(dup_pairs)
        # cluster_id is the min member id; drop every non-representative
        losers = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias(id_col))
        cur = cur.join(losers, id_col, "left_anti")
        cur = _stage("near_dedup", cur)

    if test_docs is not None and config.contamination_max is not None:
        both = cur.select(
            F.col(id_col), F.col(text_col), F.lit(True).alias("__is_train")
        ).unionByName(
            test_docs.select(
                F.col(id_col),
                F.col(text_col),
                F.lit(False).alias("__is_train"),
            )
        )
        # roles swapped on purpose: per-TRAINING-doc overlap against
        # the benchmark shingle set (see docstring)
        report = shingle_contamination(
            both,
            is_test=F.col("__is_train"),
            id_col=id_col,
            text_col=text_col,
        )
        dirty = report.filter(
            F.col("contamination") > config.contamination_max
        ).select(F.col(id_col))
        cur = cur.join(dirty, id_col, "left_anti")
        cur = _stage("decontaminated", cur)

    if (
        test_docs is not None
        and config.span_decontaminate_l_tokens is not None
    ):
        from .substrings import remove_contaminated_spans

        cur = remove_contaminated_spans(
            cur,
            test_docs,
            id_col=id_col,
            text_col=text_col,
            l_tokens=config.span_decontaminate_l_tokens,
        )
        cur = _stage("span_decontaminated", cur)

    if config.redact:
        cur = redact_pii(cur, text_col=text_col, count_matches=False).drop(
            f"{text_col}_raw"
        )
        cur = _stage("redacted", cur)

    if config.mix_weights is not None:
        cur = upsample_by_group(
            cur,
            weights=config.mix_weights,
            group_col=group_col,
            id_col=id_col,
        )
        cur = _stage("mixed", cur)

    return cur, stages


def curation_report(
    docs: DataFrame,
    stages: dict[str, DataFrame],
    id_col: str = "doc_id",
    with_membership: bool = False,
) -> DataFrame:
    """One row per stage: documents surviving after it (the input
    corpus reports as stage ``input``).  A diagnostic, not part of
    the pipeline plan — collecting it executes each stage's prefix;
    counts are distinct-document counts so the mixing stage reports
    documents, not copies.

    ``with_membership=True`` adds per-stage ``n_rows`` (row count —
    differs from n_docs only for the mixing stage, where it counts
    copies) and ``ids_md5``: the md5 of the numerically-sorted,
    comma-joined id list WITH multiplicity.  That hash pins the exact
    membership of every stage — which documents survived, and how
    many copies the mixer emitted — not just the counts.  Each
    stage's id list is bounded by the corpus document count, and the
    aggregate runs per stage key, so the report stays a driver-sized
    result at any corpus scale."""
    parts = [
        docs.select(F.lit("00:input").alias("stage"), F.col(id_col))
    ]
    for i, (name, df) in enumerate(stages.items(), start=1):
        parts.append(
            df.select(
                F.lit(f"{i:02d}:{name}").alias("stage"), F.col(id_col)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    aggs = [F.countDistinct(id_col).alias("n_docs")]
    if with_membership:
        aggs = [
            F.count("*").alias("n_rows"),
            F.countDistinct(id_col).alias("n_docs"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col(id_col))),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("ids_md5"),
        ]
    return out.groupBy("stage").agg(*aggs).orderBy("stage")
