"""Substring-level dedup tests: winnowing fingerprints against a
pure-Python mirror, the winnowing match guarantee, repeated-window
removal semantics (planted spans, long runs, intra-doc repeats,
decontamination), and map-only plan gates."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.substrings import (
    corpus_hot_windows,
    duplicate_window_stats,
    remove_contaminated_spans,
    remove_duplicate_spans,
    token_window_occurrences,
    winnow_candidate_pairs,
    winnow_dropped_groups,
    winnow_fingerprints,
)
from tests.test_plans_quality import plan_of


def _hash32(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)


def _winnow_py(tokens, k, w):
    """Reference winnowing: rightmost minimum per window of w grams."""
    if len(tokens) < k:
        return set()
    hs = [
        _hash32(" ".join(tokens[i : i + k]))
        for i in range(len(tokens) - k + 1)
    ]
    n = len(hs)
    sel = set()
    for s in range(max(n - w, 0) + 1):
        best = (-1, 1 << 63)
        for i in range(s, min(s + w - 1, n - 1) + 1):
            if hs[i] <= best[1]:
                best = (i, hs[i])
        sel.add(best)
    return sel


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnow_matches_python_mirror(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d e f g h i j k l m n o p",
        "one two three",          # exactly k tokens -> 1 gram, 1 window
        "repeat repeat repeat repeat repeat",  # identical grams, tie rule
        "x y",                    # < k tokens -> no fingerprints
    ]
    out = winnow_fingerprints(_docs(spark, texts), k=3, window=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_py(t.split(" "), 3, 4), i


def test_winnow_shared_run_guarantees_shared_fingerprint(spark):
    # winnowing guarantee: any shared token run of length
    # >= k + window - 1 (= 6 here) yields at least one shared
    # fingerprint VALUE, whatever the surrounding context
    run = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"intro words here {run} tail one",
        f"completely different opening {run} other ending entirely",
        "no overlap with anything else at all in this document",
    ]
    out = winnow_fingerprints(_docs(spark, texts), k=3, window=4)
    fps = {}
    for r in out.collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[0] & fps[1], "shared 6-token run must share a fingerprint"
    assert not (fps[0] & fps[2] and fps[1] & fps[2])


def test_winnow_is_map_only(spark):
    docs = _docs(spark, ["a b c d e f g"])
    assert "Exchange" not in plan_of(winnow_fingerprints(docs))


def test_winnow_pairs_cap_and_accounting(spark):
    shared = "common shared phrase across documents here today"
    texts = [f"{shared} unique suffix {i} marker{i}" for i in range(4)]
    texts.append("entirely unrelated text with no shared content at all")
    docs = _docs(spark, texts)
    fps = winnow_fingerprints(docs, k=3, window=4)
    pairs = winnow_candidate_pairs(fps, min_shared=1).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # all 6 pairs among the 4 sharing docs, none touching doc 4
    assert {(a, b) for a in range(4) for b in range(a + 1, 4)} <= found
    assert not any(4 in p for p in found)

    # cap: every shared fingerprint's posting list has 4 members, so
    # max_group_size=3 drops them all and accounts for each
    capped = winnow_candidate_pairs(fps, min_shared=1, max_group_size=3)
    dropped = winnow_dropped_groups(fps, max_group_size=3).collect()
    assert all(r.n_members == 4 for r in dropped)
    assert len(dropped) > 0
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert not {(a, b) for a in range(4) for b in range(a + 1, 4)} & \
        capped_pairs
    # None cap keeps exact semantics
    uncapped = winnow_candidate_pairs(fps, min_shared=1,
                                      max_group_size=None).collect()
    assert {(r.id_a, r.id_b) for r in uncapped} == found


SPAN = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly 8 tokens


def test_remove_duplicate_spans_planted(spark):
    texts = [
        f"unique lead tokens {SPAN} unique tail tokens",
        f"other framing words {SPAN} and different ending",
        "totally original document with no repeated window anywhere",
        "tiny doc",  # < 8 tokens: never flagged, byte-identical
    ]
    docs = _docs(spark, texts)
    out = {r.doc_id: r.text for r in remove_duplicate_spans(docs).collect()}
    for i in (0, 1):
        for t in SPAN.split(" "):
            assert t not in out[i].split(" "), (i, out[i])
    assert "unique lead tokens" in out[0]
    assert "and different ending" in out[1]
    assert out[2] == texts[2]
    assert out[3] == texts[3]


def test_remove_duplicate_spans_long_run_fully_covered(spark):
    # a shared run LONGER than l_tokens is fully covered by its
    # overlapping stride-1 windows
    run = " ".join(f"r{i}" for i in range(12))
    texts = [f"start {run} finish", f"open {run} close extra"]
    docs = _docs(spark, texts)
    out = {r.doc_id: r.text for r in
           remove_duplicate_spans(docs, l_tokens=8).collect()}
    for i in (0, 1):
        assert not set(run.split(" ")) & set(out[i].split(" "))
    assert out[0].startswith("start") and out[0].endswith("finish")


def test_remove_spans_intra_doc_vs_cross_doc(spark):
    # the same 8-token window twice WITHIN one doc: flagged by default
    # (total occurrences >= 2), kept under cross_doc=True
    texts = [f"{SPAN} middle filler words {SPAN}",
             "another unrelated document entirely with enough tokens"]
    docs = _docs(spark, texts)
    default = {r.doc_id: r.text for r in
               remove_duplicate_spans(docs).collect()}
    assert "w1" not in default[0]
    cross = {r.doc_id: r.text for r in
             remove_duplicate_spans(docs, cross_doc=True).collect()}
    assert cross[0] == texts[0]


def test_duplicate_window_stats_counts(spark):
    texts = [f"a lead in {SPAN}", f"b intro {SPAN}",
             f"{SPAN} trailing c words"]
    docs = _docs(spark, texts)
    stats = duplicate_window_stats(docs).collect()
    span_hash = hashlib.md5(SPAN.encode()).hexdigest()
    by_hash = {r.window_hash: r for r in stats}
    assert span_hash in by_hash
    assert by_hash[span_hash].n_occurrences == 3
    assert by_hash[span_hash].n_docs == 3


def test_remove_contaminated_spans(spark):
    bench = _docs(spark, [f"question stem {SPAN} answer choice"])
    train = _docs(spark, [
        f"training text quoting {SPAN} inside a longer passage",
        "clean training document with no benchmark overlap at all",
    ])
    out = {r.doc_id: r.text for r in
           remove_contaminated_spans(train, bench).collect()}
    assert "w1" not in out[0] and "training text quoting" in out[0]
    assert out[1] == ("clean training document with no benchmark "
                      "overlap at all")


def test_injected_occurrences_and_hot_windows_equivalent(spark):
    texts = [f"pre {SPAN} post{i} extra words here" for i in range(3)]
    docs = _docs(spark, texts)
    occ = token_window_occurrences(docs)
    hot = corpus_hot_windows(docs, occurrences=occ)
    derived = remove_duplicate_spans(docs).collect()
    injected = remove_duplicate_spans(
        docs, hot_windows=hot, occurrences=occ
    ).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, injected))


def test_flagged_starts_path_equivalent(spark):
    """The shared flagged-starts frame reproduces the derived path
    exactly, and size(__ss) equals the per-doc flagged-window count
    the former second occ⋉hot branch computed (the llm_substring_dedup
    restructure relies on both)."""
    from curw_wrf_data_pusher_spark.llmops.substrings import (
        flagged_window_starts,
    )

    texts = [f"pre {SPAN} post{i} extra words here" for i in range(3)]
    texts.append("no repeated window in this document at all zzz")
    docs = _docs(spark, texts)
    occ = token_window_occurrences(docs)
    hot = corpus_hot_windows(docs, occurrences=occ)
    starts = flagged_window_starts(occ, hot)

    derived = remove_duplicate_spans(docs).collect()
    via_starts = remove_duplicate_spans(
        docs, flagged_starts=starts
    ).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, via_starts))

    counts = {
        r.doc_id: r.n
        for r in occ.join(hot, "__wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sizes = {
        r["doc_id"]: len(r["__ss"]) for r in starts.collect()
    }
    assert counts == sizes and counts  # non-trivial corpus


def test_remove_spans_preserves_other_columns_and_schema(spark):
    docs = spark.createDataFrame(
        [(1, f"x {SPAN} y", "web"), (2, f"z {SPAN} q", "books")],
        "doc_id long, text string, source string",
    )
    out = remove_duplicate_spans(docs)
    assert out.columns == ["doc_id", "source", "text"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].source == "web" and rows[2].source == "books"
    assert rows[1].text == "x y"


def test_curate_corpus_span_stages(spark):
    from curw_wrf_data_pusher_spark.llmops.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    bench_span = "q1 q2 q3 q4 q5 q6 q7 q8"
    texts = [
        f"doc zero keeps going with {SPAN} inside it somewhere",
        f"doc one also contains {SPAN} plus unique content here",
        f"doc two quotes the benchmark {bench_span} in its middle part",
        "doc three is entirely clean original text with enough tokens",
    ]
    docs = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(1000, f"stem {bench_span} answer")], "doc_id long, text string"
    )
    cfg = CurationConfig(
        span_dedup_l_tokens=8,
        span_decontaminate_l_tokens=8,
        neardup_jaccard=None,
        min_tokens=None,
        max_dup_2gram_ratio=None,
        contamination_max=None,
        redact=False,
    )
    final, stages = curate_corpus(docs, test_docs=bench, config=cfg)
    assert "span_dedup" in stages and "span_decontaminated" in stages
    out = {r.doc_id: r.text for r in final.collect()}
    assert "w1" not in out[0] and "w1" not in out[1]
    assert "q1" not in out[2] and "in its middle part" in out[2]
    assert out[3] == texts[3]
    # default config leaves both span stages out — registered
    # llm_curate_corpus stage numbering is unchanged
    _, default_stages = curate_corpus(docs, config=CurationConfig(
        neardup_jaccard=None, contamination_max=None))
    assert "span_dedup" not in default_stages
    assert "span_decontaminated" not in default_stages


def test_ngram_logfreq_hand_computed(spark):
    import math

    from curw_wrf_data_pusher_spark.llmops.retrieval import (
        ngram_logfreq_scores,
    )

    docs = _docs(spark, ["a b c", "a b d", "x"])
    out = {r.doc_id: r for r in ngram_logfreq_scores(docs, n=2).collect()}
    # counts: "a b" x2, "b c" x1, "b d" x1
    assert out[0].n_grams == 2 and out[1].n_grams == 2
    expect = round((math.log(2) + math.log(1)) / 2, 9)
    assert abs(out[0].avg_logfreq - expect) < 1e-9
    assert abs(out[1].avg_logfreq - expect) < 1e-9
    assert 2 not in out  # single-token doc has no bigrams


def test_ngram_logfreq_boilerplate_scores_higher(spark):
    from curw_wrf_data_pusher_spark.llmops.retrieval import (
        ngram_logfreq_scores,
    )

    template = "click here to subscribe to our newsletter today"
    texts = [template] * 5 + ["qzx wvu plk mnb asd fgh jkl qwe rty uio"]
    out = {r.doc_id: r.avg_logfreq for r in
           ngram_logfreq_scores(_docs(spark, texts), n=2).collect()}
    assert out[0] > out[5]
    assert out[5] == 0.0  # every gram unique -> ln(1) = 0


def test_ngram_logfreq_partitioning_invariant(spark, sf_dir):
    from curw_wrf_data_pusher_spark.llmops.retrieval import (
        ngram_logfreq_scores,
    )
    from curw_wrf_data_pusher_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    a = sorted(map(tuple, ngram_logfreq_scores(docs).collect()))
    b = sorted(map(tuple,
                   ngram_logfreq_scores(docs.repartition(7)).collect()))
    assert a == b


def test_score_cut_buckets_tiers(spark, sf_dir):
    from curw_wrf_data_pusher_spark.llmops.retrieval import (
        ngram_logfreq_scores,
        score_cut_buckets,
    )
    from curw_wrf_data_pusher_spark.sources.lake import load_table
    from tests.test_plans_quality import plan_of

    docs = load_table(spark, sf_dir, "documents")
    out = score_cut_buckets(ngram_logfreq_scores(docs))
    rows = out.collect()
    n = len(rows)
    counts = {}
    for r in rows:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    # roughly thirds (ties at the boundary go to the higher tier)
    for tier in ("head", "middle", "tail"):
        assert counts.get(tier, 0) > n // 5, counts
    # every head score >= every middle score >= every tail score
    lo_head = min(r.avg_logfreq for r in rows if r.bucket == "head")
    hi_mid = max(r.avg_logfreq for r in rows if r.bucket == "middle")
    lo_mid = min(r.avg_logfreq for r in rows if r.bucket == "middle")
    hi_tail = max(r.avg_logfreq for r in rows if r.bucket == "tail")
    assert lo_head >= hi_mid and lo_mid > hi_tail
    # scale gate: the tiering must NOT introduce a partition-less
    # window — boundaries ride a broadcast, labeling is map-side
    plan = plan_of(out)
    assert "Window" not in plan


def test_profile_table_one_scan_and_semantics(spark):
    import re

    from curw_wrf_data_pusher_spark.operators.profile import profile_table
    from tests.test_plans_quality import plan_of

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k long, v string",
    )
    out = {r.column: r for r in
           profile_table(df, exact_distinct=True).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 1
    assert out["k"].n_distinct == 3
    assert out["k"].min_value == "1" and out["k"].max_value == "3"
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    assert abs(out["v"].null_frac - 0.25) < 1e-12

    # approx path agrees on tiny cardinalities and stays ONE scan —
    # the 100 TB production contract.  The exact twin deliberately
    # runs TWO scans so the Expand (multi-column distinct) and the
    # string-buffer SortAggregate never combine into one slow path
    # (rationale in profile_table).
    approx = {r.column: r for r in profile_table(df).collect()}
    assert approx["k"].n_distinct == 3
    for exact, want_scans in ((True, 2), (False, 1)):
        plan = plan_of(profile_table(df, exact_distinct=exact))
        scans = len(re.findall(r"^\(\d+\) Scan", plan, flags=re.M))
        assert scans == want_scans, (exact, plan)


def test_curate_corpus_checkpoint_stages_equal(spark):
    from curw_wrf_data_pusher_spark.llmops.pipeline import (
        CurationConfig,
        curate_corpus,
        curation_report,
    )

    texts = [f"{SPAN} doc body {i} with several more tokens" for i in
             range(6)] + ["short doc"] * 2
    docs = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    cfg = CurationConfig(neardup_jaccard=None, contamination_max=None,
                         mix_weights={"src0": 2.0})
    outs = {}
    for ck in (False, True):
        final, stages = curate_corpus(docs, config=cfg,
                                      checkpoint_stages=ck)
        rep = curation_report(docs, stages, with_membership=True)
        outs[ck] = (sorted(map(tuple, final.collect())),
                    sorted(map(tuple, rep.collect())))
    assert outs[False] == outs[True]


def test_vocab_topk_rank_and_plan(spark):
    from curw_wrf_data_pusher_spark.llmops.retrieval import vocab_topk
    from tests.test_plans_quality import plan_of

    docs = _docs(spark, ["b a a c", "a b b", "c"])
    out = [(r.rank, r.term, r.n_occurrences) for r in
           vocab_topk(docs, k=3).collect()]
    # counts: a=3, b=3, c=2 — tie between a and b breaks on term asc
    assert out == [(1, "a", 3), (2, "b", 3), (3, "c", 2)]
    plan = plan_of(vocab_topk(docs, k=3))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_winnow_containment(spark):
    # doc 1 fully contains doc 0's text; doc 2 is unrelated
    contained = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        contained,
        f"big wrapper starts here {contained} and keeps going with more",
        "nothing in common with the others at all in any way",
    ]
    fps = winnow_fingerprints(_docs(spark, texts), k=3, window=4)
    out = {(r.id_a, r.id_b): r for r in
           winnow_candidate_pairs(fps, min_shared=1,
                                  with_containment=True).collect()}
    assert (0, 1) in out
    # containment of the contained doc approaches 1.0 (all of doc 0's
    # fingerprints that fall wholly inside the shared run also appear
    # in doc 1; edge windows at doc boundaries may differ)
    assert out[(0, 1)].containment >= 0.5
    assert all(k == (0, 1) for k in out)
    # without the flag the schema is unchanged
    plain = winnow_candidate_pairs(fps, min_shared=1)
    assert plain.columns == ["id_a", "id_b", "n_shared"]
