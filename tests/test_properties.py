"""Property tests (SURVEY.md §5.2): algebraic invariants that must hold
on any input — checked on the real tables plus hypothesis-generated
edge-case data."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_kmeans_spark.plans.registry import specs
from flink_kmeans_spark.sources import load_table

_hyp = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(st.text(alphabet="ab ", min_size=1, max_size=12), min_size=1, max_size=30))
@_hyp
def test_dedup_idempotent(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    dedup = lambda d: (
        d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    once = dedup(df)
    twice = dedup(once)
    assert once.count() == twice.count() == df.select("text").distinct().count()


@given(
    a=st.lists(st.integers(0, 50), max_size=25),
    b=st.lists(st.integers(0, 50), max_size=25),
)
@_hyp
def test_union_all_count_additive(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a], "v int")
    db = spark.createDataFrame([(x,) for x in b], "v int")
    assert da.unionByName(db).count() == len(a) + len(b)
    # and intersect/except partition the distinct left side
    inter = da.select("v").distinct().intersect(db.select("v").distinct()).count()
    exc = da.select("v").distinct().exceptAll(db.select("v").distinct()).count()
    assert inter + exc == da.select("v").distinct().count()


def test_window_topk_subset_of_full(spark, sf_dir):
    full = {
        (r["user_id"], r["event_id"])
        for r in load_table(spark, sf_dir, "events").select("user_id", "event_id").collect()
    }
    topk = {
        (r["user_id"], r["event_id"])
        for r in specs()["window_rank"].fn(spark, sf_dir).collect()
    }
    assert topk <= full
    # and per-user at most 3
    from collections import Counter

    per_user = Counter(u for u, _ in topk)
    assert max(per_user.values()) <= 3


def test_sessions_partition_events(spark, sf_dir):
    """Session windows are a partition of the event set: counts sum to
    the total and sessions never overlap per user."""
    sess = specs()["window_session"].fn(spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert int(sess["n_events"].sum()) == n_events
    for _, grp in sess.groupby("user_id"):
        g = grp.sort_values("session_start_us")
        starts = g["session_start_us"].to_numpy()[1:]
        ends = g["session_end_us"].to_numpy()[:-1]
        assert (starts >= ends).all()


def test_tumbling_counts_sum_to_total(spark, sf_dir):
    out = specs()["window_tumbling"].fn(spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert int(out["n"].sum()) == n_events


def test_sliding_counts_double_tumbling(spark, sf_dir):
    """Every event lands in exactly size/slide = 2 sliding windows."""
    out = specs()["window_sliding"].fn(spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert int(out["n"].sum()) == 2 * n_events


def test_kmeans_cost_nonincreasing_long_run(spark, sf_dir):
    from flink_kmeans_spark.operators import kmeans as km

    e = load_table(spark, sf_dir, "embeddings")
    cents = km.init_centroids(e, 10)
    prev = float("inf")
    for _ in range(6):
        assigned = km.assign(e, cents)
        cost = km.wcss(assigned)
        assert cost <= prev + 1e-9
        prev = cost
        rows = km.recompute_centroids(assigned, 64)
        by_id = {r["cid"]: [r[f"s{i}"] / r["n"] for i in range(64)] for r in rows}
        cents = [(cid, by_id.get(cid, old)) for cid, old in cents]


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)), max_size=25
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, edges):
    """Random small graphs: distributed min-label propagation must equal
    a python union-find exactly (component id = min member)."""
    from flink_kmeans_spark.operators.graph import connected_components

    ids = list(range(20))
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [(0, 0)], "id_a long, id_b long"
    ).filter(F.col("id_a") != F.col("id_b"))

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in ids}

    # max_iter ≥ worst-case diameter (19-node chain); early convergence
    # break makes the extra ceiling free on typical graphs
    got = {
        r.id: r.component
        for r in connected_components(nodes, pairs, id_col="id", max_iter=20).collect()
    }
    assert got == expected


def test_text_chunk_covers_every_token(spark, sf_dir):
    """Chunking invariants: stride-40/size-50 chunks cover every token
    position, chunk 0 starts at token 1, and concatenating the first 40
    tokens of each chunk plus the last chunk's tail reconstructs the
    doc exactly."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.plans.registry import specs
    from flink_kmeans_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    chunks = specs()["text_chunk"].fn(spark, sf_dir).toPandas()
    by_doc = dict(tuple(chunks.groupby("doc_id")))
    for _, row in docs.head(50).iterrows():
        toks = row["text"].split(" ")
        ch = by_doc[row["doc_id"]].sort_values("chunk_idx")
        # coverage: total span reaches the last token
        last = ch.iloc[-1]
        assert last["chunk_idx"] * 40 + last["chunk_tokens"] == len(toks)
        # reconstruction from strides
        rebuilt = []
        for _, c in ch.iterrows():
            ctoks = c["chunk"].split(" ") if c["chunk"] else []
            rebuilt.extend(ctoks[:40] if c["chunk_idx"] < len(ch) - 1 else ctoks)
        assert rebuilt == toks, row["doc_id"]


def test_text_pack_bins_monotone_and_complete(spark, sf_dir):
    """Packing invariants: every doc appears exactly once, bins within a
    shard are contiguous non-decreasing in doc_id order, and each bin's
    START offset is below the next bin's."""
    from flink_kmeans_spark.plans.registry import specs
    from flink_kmeans_spark.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    packed = specs()["text_pack"].fn(spark, sf_dir).toPandas()
    assert len(packed) == n_docs and packed["doc_id"].is_unique
    for shard, grp in packed.groupby("shard"):
        g = grp.sort_values("doc_id")
        bins = g["bin"].to_numpy()
        assert (bins[1:] >= bins[:-1]).all()  # non-decreasing
        # offset math: bin = floor(start_offset / 512)
        starts = g["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
        assert ((starts // 512) == bins).all()


def test_sort_based_percentile_random_data_with_nulls(spark):
    """Differential test vs numpy on random grouped data INCLUDING
    nulls: the rank-window interpolation must equal np.percentile over
    the non-null values of each group (percentile_cont ignores nulls)."""
    import random

    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(7)
    rows = []
    for g in "abc":
        for _ in range(rng.randint(30, 80)):
            v = None if rng.random() < 0.15 else round(rng.uniform(0, 1000), 3)
            rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v double")

    w = Window.partitionBy("g").orderBy("v")
    wc = Window.partitionBy("g")
    d = (
        df.filter(F.col("v").isNotNull())
        .withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("n", F.count(F.lit(1)).over(wc))
    )
    aggs = []
    for p, name in ((0.5, "p50"), (0.95, "p95")):
        pos = (F.col("n") - 1) * F.lit(p)
        lower = F.floor(pos)
        frac = pos - lower
        wgt = (
            F.when(F.col("rn") == lower, 1.0 - frac)
            .when(F.col("rn") == lower + 1, frac)
            .otherwise(0.0)
        )
        aggs.append(F.sum(F.col("v") * wgt).alias(name))
    got = {r["g"]: r for r in d.groupBy("g").agg(*aggs).collect()}

    for g in "abc":
        vals = np.array([v for gg, v in rows if gg == g and v is not None])
        assert abs(got[g]["p50"] - np.percentile(vals, 50)) < 1e-9
        assert abs(got[g]["p95"] - np.percentile(vals, 95)) < 1e-9


def test_asof_joins_match_pandas_merge_asof_random(spark):
    """Differential test: both as-of directions vs pandas merge_asof on
    random keyed event data (unique timestamps per key — merge_asof
    breaks equal-ts ties differently by construction)."""
    import random

    import pandas as pd

    from flink_kmeans_spark.operators.joins import (
        asof_join_backward,
        asof_join_forward,
    )

    rng = random.Random(11)
    lts = {(k, t) for k in range(5) for t in rng.sample(range(1000), 40)}
    rts_pool = {(k, t) for k in range(5) for t in rng.sample(range(1000), 30)}
    left_pd = pd.DataFrame(sorted(lts), columns=["key", "t"])
    right_pd = pd.DataFrame(sorted(rts_pool), columns=["key", "t"])
    right_pd["v"] = [round(rng.uniform(0, 100), 3) for _ in range(len(right_pd))]

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for direction, fn in (("backward", asof_join_backward), ("forward", asof_join_forward)):
        got = (
            fn(left, right, on=["key"], left_ts="t", right_ts="t", value_cols=["v"])
            .toPandas()
            .sort_values(["key", "t"])
            .reset_index(drop=True)
        )
        exp = (
            pd.merge_asof(
                left_pd.sort_values("t"),
                right_pd.sort_values("t"),
                on="t",
                by="key",
                direction=direction,
            )
            .sort_values(["key", "t"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_knn_graph_matches_bruteforce(spark, sf_dir):
    """The blocked k-NN graph must equal brute force exactly for every
    query (not just the bounded query set the topk key uses)."""
    from flink_kmeans_spark.operators.similarity import (
        cosine_topk_bruteforce,
        knn_graph,
    )

    e = load_table(spark, sf_dir, "embeddings")
    blocked = {
        (r["q_id"], r["rk"]): r["n_id"]
        for r in knn_graph(e, k=3, n_blocks=4).collect()
    }
    brute = {
        (r["q_id"], r["rk"]): r["n_id"]
        for r in cosine_topk_bruteforce(e, e, k=3).collect()
    }
    assert blocked == brute


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    rows = specs()["text_bm25_topk"].fn(spark, sf_dir).collect()
    assert rows, "bm25 returned no hits"
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_ewma_bounded_by_frame_extremes(spark, sf_dir):
    """A normalized weighted average can never leave [min, max] of its
    frame — catches weight/renormalization bugs."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    frame = e.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    ew = specs()["window_ewma"].fn(spark, sf_dir)
    bad = (
        ew.join(frame, "event_id")
        .where((F.col("ewma") < F.round(F.col("lo"), 6) - 1e-6)
               | (F.col("ewma") > F.round(F.col("hi"), 6) + 1e-6))
        .count()
    )
    assert bad == 0


def test_mix_rebalance_caps_at_uniform_target(spark, sf_dir):
    rows = specs()["domain_mix_rebalance"].fn(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    target = total / len(rows)
    for r in rows:
        assert 0 < r["keep_prob"] <= 1
        # expected_kept never exceeds the uniform target (cap semantics)
        assert r["expected_kept"] <= int(target) + 1
        if r["n_docs"] <= target:
            assert r["keep_prob"] == 1.0


def test_farthest_init_separation_monotone_nonincreasing(spark, sf_dir):
    """Gonzalez greedy: each new center's min-distance-to-chosen is
    <= the previous one's (the selection is always the argmax of a
    shrinking function)."""
    rows = sorted(
        specs()["kmeans_farthest_init"].fn(spark, sf_dir).collect(),
        key=lambda r: r["cid"],
    )
    seps = [r["sep"] for r in rows[1:]]  # c0's sep is defined 0
    assert all(a >= b for a, b in zip(seps, seps[1:]))


def test_cusum_nonnegative_and_day_preserving(spark, sf_dir):
    """CUSUM via prefix-minus-running-min is provably >= 0 everywhere,
    and the day grain is preserved 1:1."""
    out = specs()["events_cusum_drift"].fn(spark, sf_dir).toPandas()
    assert (out["cusum_up"] >= 0).all()
    assert out["day"].is_unique
    days = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(out) == days


def test_ab_test_probabilities_and_lift_consistent(spark, sf_dir):
    r = specs()["events_ab_test"].fn(spark, sf_dir).collect()[0]
    for p in (r["p_control"], r["p_treat"]):
        assert 0.0 <= p <= 1.0
    assert abs(r["lift"] - round(r["p_treat"] - r["p_control"], 6)) <= 1e-6
    assert r["n_control"] > 0 and r["n_treat"] > 0


def test_audio_rms_bounded_by_peak(spark, sf_dir):
    out = specs()["multimodal_audio_decode"].fn(spark, sf_dir).toPandas()
    assert (out["rms"] <= out["peak"] + 1e-9).all()
    assert (out["peak"] <= 32767).all()
    assert (out["duration_ms"] * out["sample_rate"] <= out["n_samples"] * 1000).all()


def test_twavg_bounded_by_user_extremes(spark, sf_dir):
    """A weighted average of a user's values cannot leave their
    [min, max] — catches weight-sign and interval bugs."""
    tw = specs()["events_time_weighted_avg"].fn(spark, sf_dir)
    ext = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = (
        tw.join(ext, "user_id")
        .where((F.col("twavg") < F.col("lo") - 1e-6) | (F.col("twavg") > F.col("hi") + 1e-6))
        .count()
    )
    assert bad == 0


def test_next_event_baseline_accuracy_bounds(spark, sf_dir):
    """The majority-class predictor's per-state accuracy is >= 1/k for
    k observed next-states (it picks the mode) and <= 1."""
    rows = specs()["events_next_event_baseline"].fn(spark, sf_dir).collect()
    assert rows
    types = {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        assert r["prev_t"] in types and r["predicted"] in types
        assert 1 / len(types) <= r["accuracy"] <= 1.0
        assert 0 < r["n_correct"] <= r["n_instances"]


def test_bigram_lm_logprobs_negative_and_complete(spark, sf_dir):
    """Smoothed probabilities are < 1 so mean log-probs are negative;
    every doc with >= 2 tokens scores exactly size-1 bigrams."""
    out = specs()["text_bigram_lm"].fn(spark, sf_dir)
    pdf = out.toPandas()
    assert (pdf["avg_logprob"] < 0).all()
    n_tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    joined = pdf.set_index("doc_id").join(n_tok)
    assert (joined["n_bigrams"] == joined["n"] - 1).all()
