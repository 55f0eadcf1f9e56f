"""Invariant tests for the round-2b advanced keys (hash-equality vs
DuckDB is covered by tools/check_oracles.py; these pin the semantic
invariants that survive any data regeneration)."""

import pandas as pd
import pytest

from flink_kmeans_spark.plans.registry import QUERIES


def _q(name):
    return QUERIES()[name]


def test_cms_estimate_is_one_sided(spark, sf_oracle_dir):
    pdf = _q("agg_cms_frequency")(spark, sf_oracle_dir).toPandas()
    # CMS never underestimates; with 4x512 cells on ~1.5k keys the
    # overestimate should also be tiny (collision mass per cell is small).
    assert (pdf["cms_est"] >= pdf["exact_n"]).all()
    assert (pdf["cms_est"] - pdf["exact_n"]).median() <= 50


def test_bitmap_distinct_equals_exact(spark, sf_oracle_dir):
    got = _q("agg_bitmap_distinct")(spark, sf_oracle_dir).toPandas()
    orders = pd.read_parquet(f"{sf_oracle_dir}/orders.parquet")
    exact = orders.groupby("o_orderpriority")["o_custkey"].nunique()
    for _, r in got.iterrows():
        assert r["n_distinct_cust"] == exact[r["pri"]]


def test_triangle_clustering_bounds(spark, sf_oracle_dir):
    pdf = _q("graph_triangles")(spark, sf_oracle_dir).toPandas()
    assert (pdf["degree"] >= 1).all()
    assert (pdf["clustering"] >= 0).all() and (pdf["clustering"] <= 1).all()
    # each triangle corner needs degree >= 2
    assert (pdf.loc[pdf["n_tri"] > 0, "degree"] >= 2).all()


def test_window_count_distinct_monotone_and_bounded(spark, sf_oracle_dir):
    pdf = _q("window_count_distinct")(spark, sf_oracle_dir).toPandas()
    events = pd.read_parquet(f"{sf_oracle_dir}/events.parquet")
    true_nd = events.groupby("user_id")["event_type"].nunique()
    final = pdf.groupby("user_id")["n_distinct_types"].max()
    assert final.equals(true_nd.astype(final.dtype))
    assert (pdf["n_distinct_types"] >= 1).all()


def test_unpivot_metric_coverage(spark, sf_oracle_dir):
    pdf = _q("reshape_unpivot")(spark, sf_oracle_dir).toPandas()
    per_nation = pdf.groupby("n_name")["metric"].apply(set)
    assert all(s == {"n_orders", "revenue", "max_price"} for s in per_nation)


def test_rfm_quartiles_balanced(spark, sf_oracle_dir):
    pdf = _q("events_rfm")(spark, sf_oracle_dir).toPandas()
    for c in ["r_quartile", "f_quartile", "m_quartile"]:
        counts = pdf[c].value_counts()
        assert set(counts.index) == {1, 2, 3, 4}
        assert counts.max() - counts.min() <= 1  # NTILE balance
    assert (pdf["recency_days"] >= 0).all()


def test_cooccurrence_pairs_canonical(spark, sf_oracle_dir):
    pdf = _q("mining_cooccurrence")(spark, sf_oracle_dir).toPandas()
    assert (pdf["part_a"] < pdf["part_b"]).all()
    assert (pdf["support"] >= 2).all()


def test_point_in_time_never_reads_future(spark, sf_oracle_dir):
    import pandas as pd

    pit = _q("join_point_in_time")(spark, sf_oracle_dir).toPandas()
    events = pd.read_parquet(f"{sf_oracle_dir}/events.parquet")
    ts_us = (
        pd.to_datetime(events["ts"]).astype("datetime64[ns]").astype("int64")
        // 1000
    )
    p = events[events["event_type"] == "purchase"].assign(t=ts_us)
    m = pit.merge(p[["event_id", "t"]], on="event_id")
    matched = m[m["state_since_us"].notna()]
    # PIT correctness: the carried state never starts after the event
    assert (matched["state_since_us"] <= matched["t"]).all()
    assert (matched["state_at_event"] != "purchase").all()


def test_active_users_monotone_horizons(spark, sf_oracle_dir):
    pdf = _q("events_active_users")(spark, sf_oracle_dir).toPandas()
    assert (pdf["dau"] <= pdf["wau"]).all()
    assert (pdf["wau"] <= pdf["mau"]).all()


def test_unigram_logprob_positive(spark, sf_oracle_dir):
    pdf = _q("text_unigram_logprob")(spark, sf_oracle_dir).toPandas()
    assert (pdf["avg_neg_logprob"] > 0).all()
    assert len(pdf) == 500


def test_attribution_conserves_value(spark, sf_oracle_dir):
    import pandas as pd

    attr = _q("events_attribution_linear")(spark, sf_oracle_dir).toPandas()
    events = pd.read_parquet(f"{sf_oracle_dir}/events.parquet")
    # total attributed credit == total value of purchases that had >=1
    # click touch in their 7-day window (recompute touches in pandas)
    e = events.copy()
    e["t"] = pd.to_datetime(e["ts"]).astype("datetime64[ns]").astype("int64") // 1000
    p = e[e["event_type"] == "purchase"]
    c = e[e["event_type"] == "click"]
    win = 7 * 86_400 * 1_000_000
    touched_value = 0.0
    for _, r in p.iterrows():
        cc = c[(c["user_id"] == r["user_id"]) & (c["t"] <= r["t"]) & (c["t"] > r["t"] - win)]
        if len(cc):
            touched_value += r["value"]
    # per-click credits are rounded to 4dp (driver hash discipline), so
    # conservation holds to n_clicks * 0.5e-4 absolute slack
    slack = 5e-5 * max(len(attr), 1)
    assert attr["attributed_value"].sum() == pytest.approx(touched_value, abs=slack)


def test_table_diff_matches_pandas(spark, sf_dir):
    """Recompute the snapshot diff with pandas set logic: added =
    new-only keys, removed = old-only keys, changed = both-sides keys
    whose status or total differs; unchanged rows must be absent."""
    import pandas as pd

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    old = o[o["o_orderdate"] < "1997-07-01"][
        ["o_orderkey", "o_orderstatus", "o_totalprice"]
    ]
    new = o[(o["o_orderdate"] < "1998-01-01") & (o["o_orderkey"] % 101 != 0)].copy()
    new["o_orderstatus"] = new["o_orderstatus"].where(
        new["o_orderkey"] % 97 != 0, "X"
    )
    new = new[["o_orderkey", "o_orderstatus", "o_totalprice"]]
    om = old.set_index("o_orderkey")
    nm = new.set_index("o_orderkey")
    want = {}
    for k in om.index.difference(nm.index):
        want[k] = ("removed", om.loc[k, "o_orderstatus"], None)
    for k in nm.index.difference(om.index):
        want[k] = ("added", None, nm.loc[k, "o_orderstatus"])
    both = om.index.intersection(nm.index)
    for k in both:
        if (
            om.loc[k, "o_orderstatus"] != nm.loc[k, "o_orderstatus"]
            or om.loc[k, "o_totalprice"] != nm.loc[k, "o_totalprice"]
        ):
            want[k] = ("changed", om.loc[k, "o_orderstatus"], nm.loc[k, "o_orderstatus"])
    rows = _q("table_diff")(spark, sf_dir).collect()
    got = {r["o_orderkey"]: (r["change_type"], r["old_status"], r["new_status"]) for r in rows}
    assert got == want
    assert {"added", "removed", "changed"} <= {t for t, _, _ in got.values()}


def test_source_python_stream_drains_exactly_once(spark, sf_dir):
    """The streaming Python data source must deliver every generated
    row exactly once across its micro-batches — and a SECOND run in
    the same session must work (fresh query name, re-registration)."""
    import collections

    for _ in range(2):
        rows = _q("source_python_stream")(spark, sf_dir).collect()
        got = {r["bucket"]: (r["n"], r["sum_sq"]) for r in rows}
        want = collections.defaultdict(lambda: [0, 0])
        for i in range(10_000):
            want[i % 7][0] += 1
            want[i % 7][1] += i * i
        assert got == {b: tuple(v) for b, v in want.items()}


def test_triangles_group_grain_equals_doc_grain(spark, sf_oracle_dir):
    """The r8 group-grain rewrite (probe catch #9) must reproduce the
    doc-grain ordered-edge enumeration EXACTLY, including on a corpus
    with synthesized exact-dup cliques (where the doc-grain wedge join
    is cubic in clique size — the failure the rewrite removes).
    Doc-grain truth: python triangle count over the expanded pair list."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.operators import dedup as DD
    from flink_kmeans_spark.plans.advanced import graph_triangles

    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # synthesize 7-cliques: clone 12 docs 6x with fresh ids
    base = docs.orderBy("doc_id").limit(12)
    clones = None
    for c in range(1, 7):
        cl = base.select((F.col("doc_id") + 1_000_000 * c).alias("doc_id"), "text")
        clones = cl if clones is None else clones.unionByName(cl)
    corpus = docs.unionByName(clones)

    pairs = [
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(corpus, n=3, threshold=0.8)
        .select("id_a", "id_b")
        .collect()
    ]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for x, nb in adj.items():
        nbl = sorted(nb)
        t = 0
        for i, y in enumerate(nbl):
            for z in nbl[i + 1:]:
                if z in adj.get(y, ()):
                    t += 1
        deg = len(nb)
        clu = round(2.0 * t / (deg * (deg - 1)), 4) if deg >= 2 else 0.0
        want[x] = (deg, t, clu)

    got = _triangles_via_operator(spark, corpus)
    assert got == want


def _triangles_via_operator(spark, corpus):
    """Invoke the group-grain triangle composition on an arbitrary docs
    frame by monkeypatching the table loader the callable uses."""
    import flink_kmeans_spark.plans.advanced as adv

    orig = adv._t
    try:
        adv._t = lambda s, sf, name: corpus
        out = adv.graph_triangles(spark, "unused")
        return {
            r["doc_id"]: (r["degree"], r["n_tri"], r["clustering"])
            for r in out.collect()
        }
    finally:
        adv._t = orig
