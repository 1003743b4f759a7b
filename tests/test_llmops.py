"""LLM-data-pipeline operator tests beyond the oracle gate: LSH recall
vs brute force, multimodal mapInPandas plumbing, NetCDF reader gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.llmops.multimodal import (
    DECODERS,
    extract_media_metadata,
)
from curw_wrf_data_pusher_spark.llmops.simsearch import (
    cosine_topk,
    lsh_bucket_topk,
)
from curw_wrf_data_pusher_spark.sources.lake import load_table
from curw_wrf_data_pusher_spark.sources.netcdf import read_wrf_grid


def test_lsh_topk_scores_match_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = lsh_bucket_topk(emb, queries, dim=64, k=5, bits=6).toPandas()
    assert not approx.empty
    # every approx hit's score equals the exact score for that pair
    exact_scores = {
        (r.q_id, r.n_id): r.cos for r in exact.itertuples()
    }
    agree = disagree = 0
    for r in approx.itertuples():
        if (r.q_id, r.n_id) in exact_scores:
            assert abs(exact_scores[(r.q_id, r.n_id)] - r.cos) < 1e-9
            agree += 1
        else:
            disagree += 1
    # recall sanity: buckets should recover a nonzero share of true
    # neighbours on 500 vectors
    assert agree > 0


def test_multimodal_metadata_plumbing(spark):
    """Round 12: image/audio decode is REAL (media_codecs) — rows
    carry real BMP/WAV bytes; junk payloads and unknown modalities
    fail per-row, never the task."""
    import numpy as np

    from curw_wrf_data_pusher_spark.llmops.media_codecs import (
        encode_bmp,
        encode_wav,
    )

    bmp = encode_bmp(np.full((7, 5, 3), 42, dtype=np.uint8))
    wav = encode_wav(np.zeros((250, 1), dtype=np.int16), 8000)
    rows = [
        (1, "image", bmp),
        (2, "audio", wav),
        (3, "hologram", b"unsupported modality"),
        (4, "image", None),  # null payload: nothing decodable
    ]
    df = spark.createDataFrame(rows, "id long, modality string, content binary")
    out = extract_media_metadata(df).toPandas().set_index("id")

    assert bool(out.loc[1, "ok"]) and out.loc[1, "n_bytes"] == len(bmp)
    assert (int(out.loc[1, "width"]), int(out.loc[1, "height"])) == (5, 7)
    # audio META_SCHEMA convention: width=sample_rate, height=channels
    assert bool(out.loc[2, "ok"])
    assert (int(out.loc[2, "width"]), int(out.loc[2, "n_frames"])) == (
        8000, 250,
    )
    # unknown modality: captured per-row, job does not die
    assert not bool(out.loc[3, "ok"])
    assert "NotImplementedError" in out.loc[3, "error"]
    # null payload: hashed as empty, fails decode per-row (honest —
    # the pre-round-12 fake decoder reported dimensions for ANYTHING)
    assert out.loc[4, "n_bytes"] == 0
    assert not bool(out.loc[4, "ok"])
    assert "UnsupportedMediaError" in out.loc[4, "error"]


def test_netcdf_reader_dispatches_pure_codecs_by_magic(spark, tmp_path):
    """With netCDF4 absent the reader falls back to pure-numpy codecs
    dispatched by magic — classic CDF via sources/netcdf3, HDF5 via
    sources/hdf5 (round 10).  An empty watch dir yields zero rows;
    MALFORMED HDF5 bytes now reach the HDF5 codec and fail with its
    structural error (not an install hint — the reader is real)."""
    assert read_wrf_grid(spark, str(tmp_path)).count() == 0
    d = tmp_path / "wrfA"
    d.mkdir()
    (d / "h5.nc").write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(Exception, match="object header version"):
        read_wrf_grid(spark, str(tmp_path)).count()


def test_decoder_registry_is_pluggable(spark):
    calls = []

    def custom(payload, modality):
        calls.append(modality)
        return {"width": 7, "height": 9, "n_frames": 3}

    DECODERS["video"] = custom
    try:
        df = spark.createDataFrame(
            [(1, "video", b"fake mp4")], "id long, modality string, content binary"
        )
        out = extract_media_metadata(df).toPandas()
        assert int(out.loc[0, "width"]) == 7
        assert int(out.loc[0, "n_frames"]) == 3
    finally:
        from curw_wrf_data_pusher_spark.llmops.multimodal import _fake_decode

        DECODERS["video"] = _fake_decode


def test_media_features_feed_similarity_search(spark):
    """Multimodal fan-out → similarity search composition: features
    from the media UDF must plug straight into cosine_topk."""
    from curw_wrf_data_pusher_spark.llmops.multimodal import (
        extract_media_features,
    )

    import numpy as np

    from curw_wrf_data_pusher_spark.llmops.media_codecs import encode_bmp

    rng = np.random.default_rng(0)
    blobs = [
        encode_bmp(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    rows = [(i, "image", blobs[i % 4]) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, modality string, content binary")
    feats = extract_media_features(df, dim=16)
    pdf = feats.toPandas()
    assert (pdf["feat_dim"] == 16).all() and pdf["ok"].all()
    assert all(len(f) == 16 for f in pdf["feature"])

    # identical payloads → identical vectors → cosine 1.0 neighbours
    emb = feats.select(
        F.col("id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    top = cosine_topk(emb, emb.filter(F.col("vec_id") < 4), k=2).toPandas()
    best = top[top["rank"] == 1].set_index("q_id")
    for q in range(4):
        assert best.loc[q, "cos"] == 1.0  # its payload-twin
        assert best.loc[q, "n_id"] % 4 == q % 4


def test_ivf_topk_recall_and_exactness(spark, sf_dir):
    from curw_wrf_data_pusher_spark.llmops.simsearch import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    exact_pairs = set(zip(exact.q_id, exact.n_id))
    exact_scores = {(r.q_id, r.n_id): r.cos for r in exact.itertuples()}

    approx = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).toPandas()
    assert not approx.empty
    # every IVF score equals the exact score for that pair
    for r in approx.itertuples():
        if (r.q_id, r.n_id) in exact_scores:
            assert exact_scores[(r.q_id, r.n_id)] == r.cos
    # modest recall on unstructured synthetic vectors (~n_probe/n_cent
    # of the corpus probed)
    hit = len(set(zip(approx.q_id, approx.n_id)) & exact_pairs)
    assert hit / len(exact_pairs) > 0.15

    # probing EVERY centroid must reproduce brute force exactly
    full = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8).toPandas()
    assert set(zip(full.q_id, full.n_id)) == exact_pairs


def test_cc_three_way_agreement(spark):
    """Union-find, large-star/small-star, and min-label propagation
    must produce the identical (doc_id, cluster_id=component-min) map —
    including on a long chain (min-label's worst case: diameter rounds;
    star: O(log diameter); union-find: one pass)."""
    import random

    from curw_wrf_data_pusher_spark.llmops.clusters import (
        connected_components,
        connected_components_local,
        connected_components_star,
    )

    rng = random.Random(7)
    # chain 0-1-2-...-19 (diameter 19), a dense clique, some random
    # edges, an isolated pair, self-contained duplicates
    edges = [(i, i + 1) for i in range(19)]
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(rng.randrange(200, 230), rng.randrange(200, 230))
              for _ in range(40)]
    edges += [(500, 501), (1, 0), (3, 2)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    ml = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    st = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_star(pairs).collect()
    }
    uf = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_local(pairs).collect()
    }
    assert st == ml
    assert uf == ml
    # chain collapses to one component rooted at 0
    assert all(c == 0 for d, c in st if d < 20)


def test_kmeans_refinement_improves_quantization(spark, sf_dir):
    """Lloyd refinement must improve the spherical k-means objective
    (mean cosine of each vector to its assigned centroid) and balance
    the inverted lists; full-probe IVF must stay exactly brute force.

    Recall at fixed n_probe is deliberately NOT asserted to rise: the
    synthetic embeddings are uniform (clusterless), where balancing
    lists spreads true neighbours across them — on real clustered
    embeddings the aligned lists are what buys recall."""
    import statistics

    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        _nearest_centroid_expr,
        ivf_topk,
        kmeans_refine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(16)
        .collect()
    )
    seed = [[float(v) for v in r["embedding"]] for r in seed_rows]
    refined = kmeans_refine(emb, seed, iterations=2)

    def objective_and_sizes(cents):
        from curw_wrf_data_pusher_spark.llmops.simsearch import _dot, _norm

        best = F.array_max(
            F.array(
                *[
                    _dot(F.col("embedding"), F.array(*map(F.lit, c)))
                    / (
                        _norm(F.col("embedding"))
                        * _norm(F.array(*map(F.lit, c)))
                    )
                    for c in cents
                ]
            )
        )
        obj = emb.agg(F.avg(best)).collect()[0][0]
        sizes = [
            r["count"]
            for r in emb.withColumn(
                "c", _nearest_centroid_expr(F.col("embedding"), cents, 1)[0]
            )
            .groupBy("c")
            .count()
            .collect()
        ]
        return obj, statistics.pstdev(sizes)

    obj_seed, spread_seed = objective_and_sizes(seed)
    obj_ref, spread_ref = objective_and_sizes(refined)
    assert obj_ref > obj_seed  # Lloyd monotonically improves the objective
    assert spread_ref <= spread_seed  # lists get more balanced

    # probing every centroid reproduces brute force, refined or not
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    full = ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8, refine_iterations=2
    ).toPandas()
    assert set(zip(full.q_id, full.n_id)) == set(zip(exact.q_id, exact.n_id))


def test_media_pointer_ingestion_path_mode(spark, tmp_path):
    """binaryFile pointer listing + path-mode extraction must produce
    the same metadata as payload-mode, without content ever entering
    the pointer table; missing files degrade to ok=false rows."""
    from curw_wrf_data_pusher_spark.llmops.multimodal import (
        extract_media_metadata,
        read_media_pointers,
    )

    import numpy as np

    from curw_wrf_data_pusher_spark.llmops.media_codecs import (
        encode_bmp,
        encode_wav,
    )

    media = tmp_path / "media"
    media.mkdir()
    blobs = {
        "a.bmp": encode_bmp(np.full((2, 3, 3), 9, dtype=np.uint8)),
        "b.wav": encode_wav(np.zeros(50, dtype=np.int16), 4000),
        "c.mp4": b"\x00\x00ftypmp4-bytes-xyz",  # video stays fake-decoded
    }
    for name, data in blobs.items():
        (media / name).write_bytes(data)

    ptr = read_media_pointers(spark, str(media))
    rows = {r["media_path"].split("/")[-1]: r for r in ptr.collect()}
    assert rows["a.bmp"]["modality"] == "image"
    assert rows["b.wav"]["modality"] == "audio"
    assert rows["c.mp4"]["modality"] == "video"
    assert rows["a.bmp"]["n_bytes"] == len(blobs["a.bmp"])
    assert "content" not in ptr.columns  # payloads pruned at the source

    with_ids = ptr.withColumn(
        "id", F.xxhash64("media_path")
    )
    path_meta = extract_media_metadata(
        with_ids, id_col="id", content_col="media_path",
        modality_col="modality", from_paths=True,
    ).toPandas().set_index("id")

    # payload-mode twin over the same bytes
    payload_df = spark.createDataFrame(
        [
            (r["id"], rows_m, blobs[name])
            for name, r in rows.items()
            for r, rows_m in [(with_ids.filter(
                F.col("media_path") == r["media_path"]).first(), r["modality"])]
        ],
        "id long, modality string, content binary",
    )
    pay_meta = extract_media_metadata(payload_df).toPandas().set_index("id")
    for i in path_meta.index:
        assert path_meta.loc[i, "content_hash"] == pay_meta.loc[i, "content_hash"]
        assert path_meta.loc[i, "ok"] and pay_meta.loc[i, "ok"]
        assert path_meta.loc[i, "width"] == pay_meta.loc[i, "width"]

    # a dangling pointer must not kill the task
    dangling = spark.createDataFrame(
        [(1, "image", str(media / "gone.jpg"))],
        "id long, modality string, media_path string",
    )
    bad = extract_media_metadata(
        dangling, id_col="id", content_col="media_path",
        modality_col="modality", from_paths=True,
    ).collect()[0]
    assert bad["ok"] is False and "FileNotFoundError" in bad["error"]


def test_netcdf_writer_gated_and_cube_assembly(spark, tmp_path):
    """The cube reassembly — the writer's actual logic — must invert
    the reader's meshgrid flatten exactly, including bbox-sliced
    grids.  (The writer itself no longer gates on netCDF4: round 9's
    classic codec writes real CDF-2 bytes — the full Spark round trip
    lives in tests/test_netcdf3.py.)"""
    import numpy as np

    from curw_wrf_data_pusher_spark.sources.netcdf import (
        assemble_grid_cube,
    )
    from tests.wrf_fixture import make_grid_pdf

    # one (wrf_system, source_file) group — the writer's per-task unit
    pdf = make_grid_pdf()
    pdf = pdf[pdf["wrf_system"] == "A"].reset_index(drop=True)
    times, lats, lons, cube = assemble_grid_cube(pdf)
    n_t = pdf["t_idx"].nunique()
    n_y = pdf["y"].nunique()
    n_x = pdf["x"].nunique()
    assert cube.shape == (n_t, n_y, n_x)
    assert not np.isnan(cube).any()  # dense input → dense cube
    # spot-check the inverse mapping row-by-row on a sample
    sample = pdf.sample(n=25, random_state=1)
    t_pos = {v: i for i, v in enumerate(np.sort(pdf["t_idx"].unique()))}
    y_pos = {v: i for i, v in enumerate(np.sort(pdf["y"].unique()))}
    x_pos = {v: i for i, v in enumerate(np.sort(pdf["x"].unique()))}
    for _, r in sample.iterrows():
        assert cube[t_pos[r["t_idx"]], y_pos[r["y"]], x_pos[r["x"]]] == (
            r["rainnc_cum"]
        )
        assert lats[y_pos[r["y"]]] == r["latitude"]
        assert lons[x_pos[r["x"]]] == r["longitude"]

    # bbox-sliced (sparse) input: absent cells become NaN, axes shrink
    sliced = pdf[pdf["y"] > pdf["y"].min()]
    _, lats2, _, cube2 = assemble_grid_cube(sliced)
    assert len(lats2) == n_y - 1 and cube2.shape[1] == n_y - 1


def test_map_only_signature_twins_match_long_forms(spark, sf_dir):
    """The zero-shuffle array forms must be value-identical to their
    exploded long-format twins (same tokenization, hashing, minima /
    sign-sums) — the oracle gate runs against the array forms, so this
    pins the equivalence both directions."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        minhash_signatures,
        minhash_signatures_from_text,
        shingles,
        simhash,
        simhash_from_text,
    )

    docs = load_table(spark, sf_dir, "documents")

    sig_long = simhash(
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
    )
    sig_arr = simhash_from_text(docs)
    assert sig_long.exceptAll(sig_arr).count() == 0
    assert sig_arr.exceptAll(sig_long).count() == 0

    mh_long = minhash_signatures(shingles(docs))
    mh_arr = minhash_signatures_from_text(docs)
    assert mh_long.exceptAll(mh_arr).count() == 0
    assert mh_arr.exceptAll(mh_long).count() == 0


def test_map_only_signatures_have_no_aggregate_exchange(spark, sf_dir):
    """Plan gate: the array signature forms must contain NO exchange at
    all once the input is wide — the signature stage is a pure scan."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        minhash_signatures_from_text,
        simhash_from_text,
    )
    from .test_plans_quality import count_nodes, plan_of

    docs = load_table(spark, sf_dir, "documents").repartition(8)
    for df in (simhash_from_text(docs), minhash_signatures_from_text(docs)):
        plan = plan_of(df)
        # the only exchange permitted is the caller's input repartition
        assert count_nodes(plan, "Exchange") <= 1
        assert "HashAggregate" not in plan


def test_star_cc_raises_on_nonconvergence(spark):
    """A chain graph cannot reach its edge fixed point in one round —
    the star fallback must fail loudly rather than return
    partially-merged clusters."""
    from curw_wrf_data_pusher_spark.llmops.clusters import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="not a fixed point"):
        connected_components_star(chain, max_iterations=1)


def test_spread_skips_wide_plans_and_widens_narrow_scans(spark, sf_dir):
    from curw_wrf_data_pusher_spark.sources.lake import spread

    target = spark.sparkContext.defaultParallelism
    # post-shuffle plan already at/above target: spread is a no-op
    wide = load_table(spark, sf_dir, "lineitem").repartition(target)
    assert spread(wide) is wide
    # single-file scan: parquet row-group splits are not real
    # parallelism — spread must repartition
    narrow = load_table(spark, sf_dir, "documents")
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() >= target


def test_simhash_banded_equals_broadcast_allpairs(spark, sf_dir):
    """Pigeonhole guarantee: the banded equi-join candidate generation
    plus exact bit_count verify must reproduce the O(n²) broadcast
    inequality self-join EXACTLY (every pair within the radius, their
    hamming values, nothing else)."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        simhash_from_text,
        simhash_neighbors_banded,
    )

    sig = simhash_from_text(
        load_table(spark, sf_dir, "documents").repartition(8)
    ).localCheckpoint()
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neighbors_banded(sig, radius=6).collect()
    }
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .collect()
    }
    assert banded == brute
    assert len(banded) > 0  # non-vacuous: sf corpus has near-dups


def test_simhash_banded_radius_validation(spark):
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        simhash_neighbors_banded,
    )

    sig = spark.createDataFrame([(1, 3)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="empty blocks"):
        simhash_neighbors_banded(sig, radius=32, bits=32)


def test_simhash_neighbors_query_has_no_nested_loop_join(spark, sf_dir):
    """The registered neighbour query must run on the banded scale path:
    no BroadcastNestedLoopJoin (the O(n²) form is kept only as the
    llm_dedup test oracle)."""
    from curw_wrf_data_pusher_spark.queries import QUERIES

    from .test_plans_quality import plan_of

    plan = plan_of(QUERIES["llm_simhash_neighbors"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_verify_join_strategy_pinned(spark, sf_dir):
    """The exact-verify joins (candidates x per-doc set arrays) must be
    SHUFFLED HASH joins, never broadcast: the r11 and r15 100x probes
    each OOM'd a planner-chosen broadcast through a different hole
    (r11: un-measurable checkpoint-backed sets side broadcast; r15:
    the CANDIDATES side statically broadcast because its size estimate
    through the Generate->aggregate chain stays small regardless of
    the actual pair count — 12.5M pairs at 500k docs).  AQE cannot
    demote a static broadcast, so the strategy is pinned at the
    source (verify_candidates and the setsim_join_between inline
    verify)."""
    from curw_wrf_data_pusher_spark.llmops.dedup import shingles
    from curw_wrf_data_pusher_spark.llmops.setjoin import (
        setsim_join,
        setsim_join_between,
    )
    from curw_wrf_data_pusher_spark.sources.lake import load_table

    from .test_plans_quality import plan_of

    docs = load_table(spark, sf_dir, "documents")
    tok = shingles(docs)
    for df in (
        setsim_join(tok, token_col="shingle", threshold=0.5),
        setsim_join_between(
            shingles(docs.filter(F.col("doc_id") % 2 == 0)),
            shingles(docs.filter(F.col("doc_id") % 2 == 1)),
            token_col="shingle",
            threshold=0.5,
        ),
    ):
        plan = plan_of(df)
        # the two id-keyed verify joins (one per side) — the df-count
        # join deeper in the tree may legitimately broadcast (its
        # count side sits above a measured exchange)
        assert plan.count("ShuffledHashJoin") >= 2


def test_lsh_hot_bucket_cap(spark):
    """A template-heavy corpus (many identical docs → one hot bucket)
    must have its |bucket|² pair explosion capped by max_bucket_size,
    with the dropped buckets reported by the accounting companion.
    Default None keeps exact LSH semantics."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_signatures_from_text,
    )

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(40)]
    rows += [(100 + i, f"unique document number {i} with its own words here")
             for i in range(6)]
    # two near-dup docs that share shingles with each other only
    rows += [(200, "alpha beta gamma delta epsilon zeta"),
             (201, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures_from_text(docs).localCheckpoint()

    uncapped = lsh_candidate_pairs(sig)
    capped = lsh_candidate_pairs(sig, max_bucket_size=10)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # uncapped: the 40-doc template bucket alone emits 780 pairs
    assert n_uncapped >= 780
    # capped: template bucket dropped; the small clusters survive
    assert 0 < n_capped < 100
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (200, 201) in capped_pairs
    assert all(p in {(r.id_a, r.id_b) for r in uncapped.collect()}
               for p in capped_pairs)
    # accounting: every band's template bucket is reported with its size
    dropped = lsh_dropped_buckets(sig, max_bucket_size=10).collect()
    assert len(dropped) == 4  # one hot bucket per band
    assert all(r.n_members == 40 for r in dropped)
    # None → no drops, identical pair set
    assert lsh_dropped_buckets(sig, max_bucket_size=None).count() == 0


def test_dedup_clusters_query_not_single_task(spark, sf_dir):
    """The registered cluster query must materialize the LSH pairs
    (localCheckpoint) BEFORE the single-task union-find: its plan reads
    the checkpointed RDD, and the pair-dedup aggregation must NOT sit
    under the coalesce(1) (which would serialize it into one task)."""
    from curw_wrf_data_pusher_spark.queries import QUERIES

    from .test_plans_quality import plan_of

    df = QUERIES["llm_dedup_clusters"](spark, sf_dir)
    plan = plan_of(df)
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "HashAggregate" not in plan
    assert "ObjectHashAggregate" not in plan
    assert "SortAggregate" not in plan


def test_banded_neardup_equals_allpairs(spark, sf_dir):
    """Pivot-angle banding is EXACT (triangle inequality on the
    sphere): the banded equi-join must reproduce the O(n²) broadcast
    inequality self-join pair-for-pair, cos values included — at the
    registered driver threshold and a tighter one."""
    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        banded_neardup_pairs,
        neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    for thr in (0.35, 0.5):
        brute = {
            (r.id_a, r.id_b, r.cos)
            for r in neardup_pairs(emb, threshold=thr).collect()
        }
        banded = {
            (r.id_a, r.id_b, r.cos)
            for r in banded_neardup_pairs(emb, threshold=thr, dim=64).collect()
        }
        assert banded == brute
    # non-vacuous at the registered threshold: the corpus has near-dups
    assert len(
        banded_neardup_pairs(emb, threshold=0.35, dim=64).take(1)
    ) == 1


def test_embedding_neardup_query_has_no_nested_loop_join(spark, sf_dir):
    """The registered embedding near-dup plan must be the banded
    equi-join — no BroadcastNestedLoopJoin / CartesianProduct (the
    all-pairs form survives only as the unregistered test oracle).
    The compound row's topk branch deliberately broadcasts the tiny
    query side, so the gate targets the neardup branch."""
    from curw_wrf_data_pusher_spark.queries.llm_dedup import llm_embedding_neardup

    from .test_plans_quality import plan_of

    plan = plan_of(llm_embedding_neardup(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_banded_neardup_hot_cell_cap(spark):
    """A template cluster of near-identical embeddings lands every
    member in the same (b1, b2) band cells; max_cell_size must drop
    those cells before the |cell|² equi-join while keeping pairs in
    small cells, with the skipped cells reported by
    neardup_dropped_cells.  Default None keeps exact semantics
    (identical rows to the uncapped run)."""
    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        banded_neardup_pairs,
        neardup_dropped_cells,
    )

    dim = 8
    rows = []
    # 30-copy template: e0 plus a tiny per-member e1 perturbation
    for i in range(30):
        v = [0.0] * dim
        v[0] = 1.0
        v[1] = 1e-6 * (i + 1)
        rows.append((i, v))
    # one distinct near-dup pair pointing the opposite way — its pivot
    # angles sit ~pi away from the template's, so its band cells never
    # collide with the template cells
    for j, scale in ((200, 0.0100), (201, 0.0102)):
        w = [0.0] * dim
        w[0] = -1.0
        w[2] = scale
        rows.append((j, w))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )

    kw = dict(threshold=0.95, dim=dim, id_col="vec_id",
              vec_col="embedding")
    uncapped = {
        (r.id_a, r.id_b)
        for r in banded_neardup_pairs(emb, **kw).collect()
    }
    # template expands C(30,2) pairs + the one distinct pair
    assert len(uncapped) == 435 + 1 and (200, 201) in uncapped

    # None cap is byte-identical to the plain call (registered-row
    # hash safety)
    nonecap = {
        (r.id_a, r.id_b)
        for r in banded_neardup_pairs(
            emb, max_cell_size=None, **kw
        ).collect()
    }
    assert nonecap == uncapped

    capped = {
        (r.id_a, r.id_b)
        for r in banded_neardup_pairs(
            emb, max_cell_size=10, **kw
        ).collect()
    }
    assert capped == {(200, 201)}  # template dropped, small pair kept

    # accounting: the template's 4 replicated cells reported with the
    # full member count (one also holds 2 replicas of the pair — a
    # non-meeting cell for it, so the pair still survives above); the
    # pair's own meeting cell is not reported
    dropped = neardup_dropped_cells(
        emb, max_cell_size=10, **kw
    ).collect()
    assert sorted(r.n_members for r in dropped) == [30, 30, 30, 32]
    assert neardup_dropped_cells(
        emb, max_cell_size=None, **kw
    ).count() == 0


def test_banded_neardup_join_is_shuffled_equi_join(spark, sf_dir):
    """Skew posture of the registered near-dup branch: the candidate
    join must be a SHUFFLED equi-join on the band cells (sort-merge or
    shuffled-hash — the shape AQE's skew-join splitting can act on),
    and the session must have AQE skew-join enabled so a hot (b1, b2)
    cell splits across tasks at runtime.  Interplay with
    max_cell_size: AQE bounds the per-task straggle of a hot cell,
    the cap bounds the intrinsic |cell|² pair count itself — a
    production job wants both."""
    from curw_wrf_data_pusher_spark.queries.llm_dedup import llm_embedding_neardup

    from .test_plans_quality import plan_of

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    )
    plan = plan_of(llm_embedding_neardup(spark, sf_dir))
    # equi-join on the band cells, any hash flavor: at test SF the
    # replicated side fits under autoBroadcastJoinThreshold so
    # Catalyst picks BroadcastHashJoin; at scale the same logical plan
    # becomes SortMergeJoin/ShuffledHashJoin, where the skew conf
    # applies.  A BNLJ/CartesianProduct here would mean the band keys
    # were lost (gated separately above).
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_simhash_hot_block_cap(spark):
    """A template-heavy corpus (identical signatures share EVERY
    pigeonhole block) must have its |block|² pair explosion capped by
    max_block_size, with the skipped blocks reported by
    simhash_dropped_blocks.  Default None keeps exact semantics."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        simhash_dropped_blocks,
        simhash_neighbors_banded,
    )

    rows = [(i, 0) for i in range(40)]  # 40-copy template, sig 0
    # near-dup pair at hamming 1, far (>= 16) from everything else
    rows += [(200, 0xFFFFFFFF), (201, 0xFFFFFFFE)]
    # well-separated uniques whose blocks never collide with val 0
    rows += [(300, 0x55555555), (301, 0xAAAAAAAA), (302, 0x33333333)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")

    uncapped = {
        (r.id_a, r.id_b)
        for r in simhash_neighbors_banded(sig, radius=6).collect()
    }
    # template expands C(40,2) pairs + the one near-dup pair
    assert len(uncapped) == 780 + 1 and (200, 201) in uncapped

    capped = {
        (r.id_a, r.id_b)
        for r in simhash_neighbors_banded(
            sig, radius=6, max_block_size=10
        ).collect()
    }
    assert capped == {(200, 201)}  # template dropped, small pair kept

    # accounting: the template's 7 blocks (radius+1) reported with size
    dropped = simhash_dropped_blocks(
        sig, radius=6, max_block_size=10
    ).collect()
    assert len(dropped) == 7
    assert all(r.n_members == 40 for r in dropped)
    # None → nothing dropped
    assert simhash_dropped_blocks(
        sig, radius=6, max_block_size=None
    ).count() == 0


def test_estimated_jaccard_from_signatures(spark):
    """Signature-estimated Jaccard: identical docs estimate 1.0,
    disjoint docs 0.0, overlapping docs land strictly between; the
    estimate needs only the k-long signatures (no shingle re-join)."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        estimated_jaccard_pairs,
        minhash_signatures_from_text,
        ngram_jaccard_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # = 1
            (3, "alpha beta gamma delta epsilon zeta eta iota"),   # ~ 1
            (4, "one two three four five six seven eight"),        # disjoint
        ],
        "doc_id long, text string",
    )
    sig = minhash_signatures_from_text(docs).localCheckpoint()
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in estimated_jaccard_pairs(sig, cands).collect()
    }
    assert est[(1, 2)] == 1.0
    assert est[(1, 4)] == 0.0
    assert 0.0 < est[(1, 3)] <= 1.0
    # deterministic estimator, deterministic corpus: the estimate of a
    # true-Jaccard ~0.45 pair must carry signal (not collapse to 0/1)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            shingles(docs), min_jaccard=0.0
        ).collect()
    }
    assert abs(est[(1, 3)] - exact[(1, 3)]) <= 0.45  # k=8 resolution


def test_banded_neardup_property_random_vectors(spark):
    """Property check on adversarial-ish inputs: random-signed vectors,
    negative components, near-parallel and antipodal pairs, thresholds
    spanning negative to extreme — banded must equal all-pairs on every
    combination (exactness is structural, not data-dependent)."""
    import math
    import random

    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        banded_neardup_pairs,
        neardup_pairs,
    )

    rng = random.Random(7)
    dim = 8
    rows = []
    for i in range(60):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    # planted structure: exact duplicate, antipodal pair, tiny-angle pair
    rows.append((100, rows[0][1][:]))
    rows.append((101, [-v for v in rows[1][1]]))
    rows.append((102, [v + 1e-4 for v in rows[2][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for thr in (-0.5, 0.0, 0.7, 0.999999):
        brute = {
            (r.id_a, r.id_b, r.cos)
            for r in neardup_pairs(emb, threshold=thr).collect()
        }
        banded = {
            (r.id_a, r.id_b, r.cos)
            for r in banded_neardup_pairs(
                emb, threshold=thr, dim=dim
            ).collect()
        }
        assert banded == brute, f"mismatch at threshold {thr}"
    # the planted pairs actually show up where they should
    high = {
        (r.id_a, r.id_b)
        for r in banded_neardup_pairs(emb, threshold=0.999, dim=dim).collect()
    }
    assert (0, 100) in high and (2, 102) in high and (1, 101) not in high


def test_duplicated_line_stats(spark):
    """Cross-corpus duplicated lines are counted per document; intra-doc
    repetition alone does not flag a line, and short fragments are
    ignored."""
    from curw_wrf_data_pusher_spark.llmops.curation import (
        duplicated_line_stats,
    )

    boiler = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nunique alpha content line one\nshort"),
            (2, f"{boiler}\nunique beta content line two"),
            (3, "totally original document body here\n"
                "totally original document body here"),  # intra-doc dup only
            (4, "another fully unique document body"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in duplicated_line_stats(docs, min_line_chars=8).collect()
    }
    # the boilerplate line is shared by docs 1 and 2
    assert out[1].n_dup_lines == 1 and out[2].n_dup_lines == 1
    assert out[1].n_lines == 2  # 'short' dropped by min_line_chars
    assert out[1].dup_line_frac == 0.5
    assert out[2].dup_line_frac == 0.5
    # intra-doc repetition: line appears in ONE doc → not cross-corpus
    assert out[3].n_dup_lines == 0 and out[3].n_lines == 1
    assert out[4].n_dup_lines == 0 and out[4].dup_line_frac == 0.0


def test_redact_pii(spark):
    """Regex-tier PII redaction: typed placeholders, original text
    preserved, per-pattern counts; map-only plan (no shuffle)."""
    from curw_wrf_data_pusher_spark.llmops.curation import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "contact jane.doe+test@example.co.uk or call 077 123 4567"),
            (2, "server at 192.168.1.254 responded; also 999.999.1.1 is"
                " not an ip"),
            (3, "clean document, nothing to redact"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in out[1].text and "@" not in out[1].text
    assert "<PHONE>" in out[1].text and "4567" not in out[1].text
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "<IP>" in out[2].text and "192.168.1.254" not in out[2].text
    assert "999.999.1.1" in out[2].text  # out-of-range octets untouched
    assert out[2].n_ipv4 == 1
    assert out[3].text == out[3].text_raw == docs.collect()[2].text
    assert out[3].n_email == out[3].n_phone == out[3].n_ipv4 == 0
    # map-only: no exchange in the plan
    from .test_plans_quality import plan_of

    assert "Exchange" not in plan_of(redact_pii(docs))


def test_remove_duplicated_lines(spark):
    """Cross-corpus boilerplate lines are stripped from every document,
    order and short formatting lines are preserved, and an all-
    boilerplate document survives as ''."""
    from curw_wrf_data_pusher_spark.llmops.curation import (
        remove_duplicated_lines,
    )

    boiler = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nunique alpha content line one\n---\nalpha end"),
            (2, f"unique beta content line two\n{boiler}"),
            (3, boiler),                       # all-boilerplate doc
            (4, "another fully unique document body"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in remove_duplicated_lines(docs).collect()}
    assert out[1] == "unique alpha content line one\n---\nalpha end"
    assert out[2] == "unique beta content line two"
    assert out[3] == ""
    assert out[4] == "another fully unique document body"
    assert set(out) == {1, 2, 3, 4}


def test_chunk_documents(spark):
    """Sliding-window chunking: stride = max_tokens - overlap, short
    tail kept, short doc yields one chunk, map-only plan."""
    from curw_wrf_data_pusher_spark.llmops.curation import chunk_documents

    toks = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "only three tokens")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # n=10, stride=3 → ceil(9/3)=3 chunks starting at 0,3,6
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r.n_chunk_tokens for r in c1] == [4, 4, 4]
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0].chunk_text.split()[-1] == c1[1].chunk_text.split()[0]
    assert by_doc[2][0].chunk_text == "only three tokens"
    assert len(by_doc[2]) == 1
    from .test_plans_quality import plan_of

    assert "Exchange" not in plan_of(chunk_documents(docs, 4, 1))


def test_upsample_by_group(spark):
    """floor(w) copies + deterministic fractional extra; w<1 keep-set
    equals stratified_sample's; weight-0 groups vanish; map-only."""
    from curw_wrf_data_pusher_spark.llmops.curation import (
        stratified_sample,
        upsample_by_group,
    )

    docs = spark.createDataFrame(
        [(i, "src%d" % (i % 4), "t") for i in range(400)],
        "doc_id long, source string, text string",
    )
    weights = {"src0": 0.25, "src1": 2.0, "src2": 2.5, "src3": 0.0}
    out = upsample_by_group(docs, weights).groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in out}
    # src1: exactly 2 copies each
    assert counts["src1"] == 200
    # src2: 2 or 3 copies each — between 2x and 3x, deterministic
    assert 200 < counts["src2"] < 300
    # src0 ≈ 25% of 100; src3 gone
    assert 0 < counts["src0"] < 60 and "src3" not in counts
    # w<1 keep-set is EXACTLY stratified_sample's
    up = {
        r.doc_id
        for r in upsample_by_group(docs, weights)
        .filter("source = 'src0'").select("doc_id").distinct().collect()
    }
    ss = {
        r.doc_id
        for r in stratified_sample(docs, rates={"src0": 0.25})
        .filter("source = 'src0'").select("doc_id").collect()
    }
    assert up == ss
    # copy ids are dense 0..n-1
    rows = (
        upsample_by_group(docs, weights)
        .filter("source = 'src2'").groupBy("doc_id")
        .agg(
            F.min("copy_id").alias("lo"),
            F.max("copy_id").alias("hi"),
            F.count("*").alias("n"),
        )
    )
    for r in rows.collect():
        assert r.lo == 0 and r.hi == r.n - 1
    from .test_plans_quality import plan_of

    assert "Exchange" not in plan_of(upsample_by_group(docs, weights))


def test_curate_corpus_end_to_end(spark):
    """The composed pipeline drops exact dups, boilerplate lines,
    junk-quality docs, near-dups, and contaminated docs; redacts PII;
    applies mix weights — and the stage report counts are monotone
    non-increasing until mixing."""
    from curw_wrf_data_pusher_spark.llmops.pipeline import (
        CurationConfig,
        curate_corpus,
        curation_report,
    )

    body = "the quick brown fox jumps over the lazy dog near the river bank"
    near = body.replace("lazy", "sleepy")  # high-jaccard near-dup
    boiler = "subscribe to our newsletter today please"
    junk = "spam " * 40  # dup_2gram_ratio ~1 → quality-filtered
    secret = ("for support on the archival storage product please "
              "write to jane@example.com with your order number")
    contaminated = "held out benchmark question about spark shuffles here"
    docs = spark.createDataFrame(
        [
            (1, body, "web"),
            (2, body, "web"),            # exact dup of 1
            (3, near, "web"),            # near dup of 1
            (4, f"{boiler}\n{body} extra words beyond", "web"),
            (5, f"{boiler}\n{near} extra words beyond", "web"),
            (6, junk.strip(), "web"),
            (7, secret, "books"),
            (8, f"{contaminated} plus filler words to pass quality",
             "web"),
            (9, "a completely different and original document body "
                "about databases", "books"),
        ],
        "doc_id long, text string, source string",
    )
    test_docs = spark.createDataFrame(
        [(1001, contaminated)], "doc_id long, text string"
    )
    cfg = CurationConfig(
        min_tokens=5,
        max_dup_2gram_ratio=0.5,
        neardup_jaccard=0.6,
        contamination_max=0.3,
        mix_weights={"books": 2.0},
    )
    final, stages = curate_corpus(docs, test_docs=test_docs, config=cfg)
    assert list(stages) == [
        "exact_dedup", "boilerplate", "quality_filter", "near_dedup",
        "decontaminated", "redacted", "mixed",
    ]
    rows = final.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r)
    # 2 (exact dup), 6 (junk), 8 (contaminated) gone; of the near-dup
    # cluster {1,3,4,5} (4/5 reduced to body/near after boilerplate
    # removal) only the min id survives
    assert 2 not in by_id and 6 not in by_id and 8 not in by_id
    assert 1 in by_id and 3 not in by_id and 4 not in by_id
    assert 9 in by_id
    # PII redacted
    assert 7 in by_id
    assert "<EMAIL>" in by_id[7][0].text and "@" not in by_id[7][0].text
    # books docs (7, 9) appear exactly twice (weight 2.0)
    assert len(by_id[7]) == 2 and len(by_id[9]) == 2
    assert len(by_id[1]) == 1
    # report: monotone non-increasing doc counts through the drops
    rep = {
        r.stage: r.n_docs
        for r in curation_report(docs, stages).collect()
    }
    assert rep["00:input"] == 9
    seq = [rep[k] for k in sorted(rep)]
    assert all(a >= b for a, b in zip(seq[:-1], seq[:-1][1:]))
    assert rep["04:near_dedup"] < rep["03:quality_filter"]


def test_curate_corpus_empty_and_plan_shape(spark):
    """An empty corpus flows through every stage without error, and the
    composed plan contains no nested-loop/cartesian join — the
    composition must stay scale-safe, not just each stage alone."""
    from curw_wrf_data_pusher_spark.llmops.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    cfg = CurationConfig(neardup_jaccard=0.6, mix_weights={"web": 2.0})
    final, _ = curate_corpus(empty, config=cfg)
    assert final.count() == 0

    docs = spark.createDataFrame(
        [(i, f"some words number {i} repeated here and there plus "
             f"enough tokens to shingle", "web") for i in range(30)],
        "doc_id long, text string, source string",
    )
    final, _ = curate_corpus(docs, config=cfg)
    from .test_plans_quality import plan_of

    plan = plan_of(final)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_reconstruction_property(spark):
    """Invariant: dropping each non-first chunk's `overlap`-token
    prefix and concatenating reconstructs the original token stream —
    for lengths around every boundary (multiples of stride, shorter
    than one window, tail of every size)."""
    from curw_wrf_data_pusher_spark.llmops.curation import chunk_documents

    max_tokens, overlap = 6, 2
    docs = spark.createDataFrame(
        [(n, " ".join(f"t{i}" for i in range(n))) for n in range(1, 30)],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, max_tokens, overlap).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text
    for n in range(1, 30):
        chunks = [by_doc[n][i] for i in range(len(by_doc[n]))]
        toks = chunks[0].split(" ")
        for c in chunks[1:]:
            toks += c.split(" ")[overlap:]
        assert toks == [f"t{i}" for i in range(n)], n


def test_redact_pii_idempotent(spark):
    """Redaction placeholders contain nothing any pattern matches, so
    redacting twice is a no-op — the property that makes re-running a
    partially-redacted corpus safe."""
    from curw_wrf_data_pusher_spark.llmops.curation import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail a@b.io or b@c.org, dial 555-123-4567, ping "
             "10.0.0.1 then 777 888 9999")],
        "doc_id long, text string",
    )
    once = redact_pii(docs).select("doc_id", "text")
    twice = redact_pii(once).select("doc_id", "text")
    assert once.collect() == twice.collect()


def test_chunk_summary_matches_exploded(spark):
    """The map-side chunk summary (zero shuffles — the registered
    plan) must equal aggregating the exploded chunk_documents form,
    for lengths around every chunking boundary."""
    from curw_wrf_data_pusher_spark.llmops.curation import (
        chunk_documents,
        chunk_summary,
    )

    docs = spark.createDataFrame(
        [(n, " ".join(f"t{i}" for i in range(n))) for n in range(1, 40)],
        "doc_id long, text string",
    )
    summ = {
        r.doc_id: (r.n_ctx_chunks, r.ctx_chunks_md5)
        for r in chunk_summary(docs, max_tokens=6, overlap=2).collect()
    }
    exploded = (
        chunk_documents(docs, max_tokens=6, overlap=2)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("chunk_id", "chunk_text")
                            )
                        ),
                        lambda x: x["chunk_text"],
                    ),
                    "\x1f",
                )
            ).alias("h"),
        )
    )
    agg = {r.doc_id: (r.n, r.h) for r in exploded.collect()}
    assert summ == agg
    from .test_plans_quality import plan_of

    assert "Exchange" not in plan_of(chunk_summary(docs, 6, 2))


def test_hot_lines_injection_equivalence(spark):
    """Injecting a shared (localCheckpoint-ed) corpus_hot_lines frame
    must give byte-identical stats and removal output to the derive-
    internally path — the share-one-explode pattern for stats+removal
    passes over the same corpus."""
    from curw_wrf_data_pusher_spark.llmops.curation import (
        corpus_hot_lines,
        duplicated_line_stats,
        remove_duplicated_lines,
    )

    boiler = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nunique alpha content line one"),
            (2, f"{boiler}\nunique beta content line two"),
            (3, "another fully unique document body"),
        ],
        "doc_id long, text string",
    )
    hot = corpus_hot_lines(docs).localCheckpoint()
    assert hot.count() == 1
    s_inj = sorted(
        duplicated_line_stats(docs, hot_lines=hot).collect()
    )
    s_own = sorted(duplicated_line_stats(docs).collect())
    assert s_inj == s_own
    r_inj = sorted(
        remove_duplicated_lines(docs, hot_lines=hot).collect()
    )
    r_own = sorted(remove_duplicated_lines(docs).collect())
    assert r_inj == r_own


def test_quantize_embeddings_roundtrip_bound(spark):
    """Symmetric int8 quantization: |x - q*scale| <= scale/2 per
    component, q in [-127, 127], zero vectors stay zero with scale 0."""
    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        quantize_embeddings,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.125]),
        (2, [100.0, -0.001, 3.5, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r for r in quantize_embeddings(emb).collect()}
    for vid, vec in rows:
        q, scale = out[vid].qvec, out[vid].scale
        if all(v == 0.0 for v in vec):
            assert scale == 0.0 and all(c == 0 for c in q)
            continue
        assert scale == max(abs(v) for v in vec) / 127.0
        for x, c in zip(vec, q):
            assert -127 <= c <= 127
            assert abs(x - c * scale) <= scale / 2 + 1e-12


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    """int8-quantized cosine top-k must agree closely with the exact
    scan: mean overlap@5 over the 10 query vectors >= 0.8 on the
    testdata embeddings (64-dim, well-separated)."""
    from curw_wrf_data_pusher_spark.llmops.simsearch import (
        cosine_topk,
        quantized_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in cosine_topk(emb, q, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.n_id)
    quant = {}
    for r in quantized_cosine_topk(emb, q, k=5).collect():
        quant.setdefault(r.q_id, set()).add(r.n_id)
    overlaps = [
        len(exact[qid] & quant[qid]) / 5.0 for qid in exact
    ]
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps


def test_bm25_and_tfidf_hand_computed(spark):
    """BM25/TF-IDF on a 3-doc corpus vs hand-computed scores; docs
    matching no query term are absent (implicit score 0)."""
    import math

    from curw_wrf_data_pusher_spark.llmops.retrieval import (
        bm25_scores,
        tfidf_scores,
    )

    rows = [
        (1, "spark shuffle spark join"),
        (2, "window sort merge"),
        (3, "plain text only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "merge"]
    n, avgdl = 3.0, (4 + 3 + 4) / 3.0
    k1, b = 1.2, 0.75

    def bm25(tf, dl, df):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )

    got = {r.doc_id: r for r in bm25_scores(docs, terms).collect()}
    assert set(got) == {1, 2}  # doc 3 matches nothing
    assert got[1].n_matched == 1 and got[2].n_matched == 1
    assert abs(got[1].score - bm25(2, 4, 1.0)) < 1e-9
    assert abs(got[2].score - bm25(1, 3, 1.0)) < 1e-9

    ti = {r.doc_id: r for r in tfidf_scores(docs, terms).collect()}
    assert set(ti) == {1, 2}
    assert abs(ti[1].score - 2 * math.log(3.0 / 1.0)) < 1e-9
    assert abs(ti[2].score - 1 * math.log(3.0 / 1.0)) < 1e-9


def test_bm25_multi_term_fold_is_term_sorted(spark):
    """A document matching several terms sums contributions in
    term-sorted order (bit-reproducible across partitionings): the
    score must equal the Python left-fold over sorted terms, and be
    identical when the input arrives repartitioned."""
    import math

    from curw_wrf_data_pusher_spark.llmops.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [(1, "spark merge window spark"), (2, "merge only")],
        "doc_id long, text string",
    )
    terms = ["spark", "merge", "window"]
    n, avgdl = 2.0, 3.0
    k1, b = 1.2, 0.75

    def contrib(tf, dl, df):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )

    # doc 1: merge(tf1,df2), spark(tf2,df1), window(tf1,df1) — sorted
    expected = 0.0
    for t, tf, df in (("merge", 1, 2.0), ("spark", 2, 1.0),
                      ("window", 1, 1.0)):
        expected += contrib(tf, 4, df)
    got = {r.doc_id: r.score for r in bm25_scores(docs, terms).collect()}
    assert got[1] == round(expected, 9)
    got_rep = {
        r.doc_id: r.score
        for r in bm25_scores(docs.repartition(7), terms).collect()
    }
    assert got_rep == got


def test_resize_media_plumbing(spark):
    """Round 12: the image resizer is REAL (decode→nearest→re-encode
    for BMP/PNG); junk image bytes and unregistered modalities fail
    their row only."""
    import numpy as np

    from curw_wrf_data_pusher_spark.llmops.media_codecs import (
        decode_bmp,
        encode_bmp,
        image_pixels,
    )
    from curw_wrf_data_pusher_spark.llmops.multimodal import resize_media

    src = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    rows = [
        (1, "image", bytearray(encode_bmp(src))),
        (2, "image", bytearray(b"entropy-coded-or-junk")),
        (3, "audio", bytearray(b"not-resizable")),  # no audio resizer
    ]
    df = spark.createDataFrame(
        rows, "id long, modality string, content binary"
    )
    out = {r.id: r for r in resize_media(df, 3, 2).collect()}
    assert out[1].ok and out[1].width == 3 and out[1].height == 2
    resized = bytes(out[1].content)
    meta = decode_bmp(resized)
    assert (meta["width"], meta["height"]) == (3, 2)
    # nearest-neighbor on an exact 2x grid: every other pixel survives
    assert (image_pixels(resized) == src[::2, ::2]).all()
    # per-row failure isolation: undecodable image, unregistered audio
    assert not out[2].ok and "UnsupportedMediaError" in out[2].error
    assert not out[3].ok and "NotImplementedError" in out[3].error
    assert out[3].content is None


def test_sample_frames_plumbing(spark):
    from curw_wrf_data_pusher_spark.llmops.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, "video", bytearray(b"vid-a")), (2, "video", bytearray(b"vid-b")),
         (3, "image", bytearray(b"not-a-video"))],
        "id long, modality string, content binary",
    )
    rows = sample_frames(df, n_frames=3).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 3 and len(by_id[2]) == 3
    assert [r.frame_idx for r in sorted(by_id[1], key=lambda x: x.frame_idx)] == [0, 1, 2]
    # frames are deterministic and content-dependent
    again = {(r.id, r.frame_idx): bytes(r.frame)
             for r in sample_frames(df, n_frames=3).collect() if r.ok}
    for r in rows:
        if r.ok:
            assert bytes(r.frame) == again[(r.id, r.frame_idx)]
    assert bytes(by_id[1][0].frame) != bytes(by_id[2][0].frame)
    # failed blob: exactly one visible error row
    assert len(by_id[3]) == 1 and not by_id[3][0].ok


def test_sampled_frames_feed_resize_and_features(spark):
    # composition: video → frames → per-frame features, all
    # Arrow-batched.  The fake frame sampler emits hash bytes (real
    # video decode needs ffmpeg), so the image featurizer is swapped
    # for the fake one within the test — the composition under test
    # is the Spark plumbing, not the codec.
    from curw_wrf_data_pusher_spark.llmops.multimodal import (
        FEATURIZERS,
        _fake_features,
        extract_media_features,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(7, "video", bytearray(b"clip"))],
        "id long, modality string, content binary",
    )
    frames = sample_frames(df, n_frames=2).filter("ok").select(
        (F.col("id") * 10 + F.col("frame_idx")).alias("id"),
        F.lit("image").alias("modality"),
        F.col("frame").alias("content"),
    )
    real = FEATURIZERS["image"]
    FEATURIZERS["image"] = _fake_features
    try:
        feats = extract_media_features(frames, dim=8).collect()
    finally:
        FEATURIZERS["image"] = real
    assert sorted(r.id for r in feats) == [70, 71]
    assert all(r.ok and len(r.feature) == 8 for r in feats)


def test_simhash_banded_engines_agree(spark, sf_dir):
    """The codegen'd bit_count self-join (engine='join', production
    since round 15), the numpy popcount-matrix kernel (engine='arrow')
    and the Catalyst HOF scan (engine='hof', reference) emit identical
    pair sets — same contract as the pq_encode/pq_encode_arrow pair."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        simhash_from_text,
        simhash_neighbors_banded,
    )

    sig = simhash_from_text(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint()
    key = lambda r: (r.id_a, r.id_b, r.hamming)  # noqa: E731
    for radius in (3, 6):
        arrow = sorted(
            map(key, simhash_neighbors_banded(
                sig, radius=radius, engine="arrow").collect())
        )
        hof = sorted(
            map(key, simhash_neighbors_banded(
                sig, radius=radius, engine="hof").collect())
        )
        join = sorted(
            map(key, simhash_neighbors_banded(
                sig, radius=radius, engine="join").collect())
        )
        assert arrow == hof == join and len(arrow) > 0
    # the hot-block cap drops the same blocks in all engines
    capped_a = sorted(map(key, simhash_neighbors_banded(
        sig, radius=6, max_block_size=40, engine="arrow").collect()))
    capped_h = sorted(map(key, simhash_neighbors_banded(
        sig, radius=6, max_block_size=40, engine="hof").collect()))
    capped_j = sorted(map(key, simhash_neighbors_banded(
        sig, radius=6, max_block_size=40, engine="join").collect()))
    assert capped_a == capped_h == capped_j


def test_simhash_64bit_banded_prunes_and_matches_bruteforce(spark, sf_dir):
    """The corpus-scale parameterization: 64-bit signatures at radius
    6 give 9-bit pigeonhole blocks (512 values) — the banded search
    must (a) reproduce the brute-force pair set exactly, (b) agree
    between the arrow and HOF engines (multi-chunk popcount path),
    and (c) actually prune: the largest block group must be a small
    fraction of the corpus, unlike 32-bit blocks where every value
    is hot."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        _simhash_block_groups,
        simhash_from_text,
        simhash_neighbors_banded,
    )

    docs = load_table(spark, sf_dir, "documents")
    sig = simhash_from_text(docs, bits=64).localCheckpoint()
    n = sig.count()
    # top signature bit can land in the long's sign bit
    assert sig.filter("simhash < 0").count() > 0

    key = lambda r: (r.id_a, r.id_b, r.hamming)  # noqa: E731
    arrow = sorted(map(key, simhash_neighbors_banded(
        sig, radius=6, bits=64, engine="arrow").collect()))
    hof = sorted(map(key, simhash_neighbors_banded(
        sig, radius=6, bits=64, engine="hof").collect()))
    join = sorted(map(key, simhash_neighbors_banded(
        sig, radius=6, bits=64, engine="join").collect()))
    assert arrow == hof == join

    a = sig.select(F.col("doc_id").alias("id_a"),
                   F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("id_b"),
                   F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    brute = sorted(map(key, (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .collect()
    )))
    assert arrow == brute

    # pruning: with 9-bit blocks the hottest group is far below the
    # corpus size (at 32 bits the hottest block held ~half the docs)
    max_m = (
        _simhash_block_groups(sig, "doc_id", "simhash", 6, 64)
        .select(F.max(F.size("ms"))).first()[0]
    )
    assert max_m < n / 4, (max_m, n)


def test_simhash_cap_recovers_pairs_via_later_blocks(spark):
    """The pre-rewrite cap contract: a pair whose FIRST matching
    block is capped away must still be found through a later uncapped
    matching block.  docs 0 and 1 share EVERY block; all docs share
    block 0's value (hot), so block 0 exceeds the cap — the (0, 1)
    pair must come back via block 1+, in BOTH engines, exactly once."""
    from curw_wrf_data_pusher_spark.llmops.dedup import (
        simhash_neighbors_banded,
    )

    # 32-bit sigs, radius 6 → widths [5,5,5,5,4,4,4]; doc i>=2 gets
    # sig i<<5: block 0 (bits 0-4) is 0 for everyone, block 1 is i —
    # distinct per doc.  docs 0 and 1 both have sig 0 (hamming 0).
    rows = [(0, 0), (1, 0)] + [(i, i << 5) for i in range(2, 30)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    for engine in ("arrow", "hof"):
        pairs = simhash_neighbors_banded(
            sig, radius=6, max_block_size=10, engine=engine
        ).collect()
        got = [(r.id_a, r.id_b, r.hamming) for r in pairs]
        assert got == [(0, 1, 0)], (engine, got)
