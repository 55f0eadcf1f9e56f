"""Semantic tests for the extended analytics surface
(plans/analytics.py + the late text/similarity additions in plans/llm.py).

Each test recomputes the operator's semantics independently (pandas /
numpy / pure Python) rather than trusting the SQL oracle alone — the
oracle gate proves Spark==DuckDB; these prove both equal the intended
math. The data-quality test additionally builds a CORRUPTED copy of the
tables to prove the checks actually fire (a clean-data-only test would
pass with `SELECT 0`)."""

import collections
import shutil

import numpy as np
import pandas as pd
import pytest

from flink_kmeans_spark.plans import registry
from conftest import SCRATCH_DIR


def _q(name):
    registry._load_all()
    return registry._SPECS[name].fn


def test_agg_mode_matches_pandas_with_deterministic_tiebreak(spark, sf_dir):
    got = {
        r["seg"]: (r["mode_pri"], r["mode_cnt"])
        for r in _q("agg_mode")(spark, sf_dir).collect()
    }
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for seg, grp in j.groupby("c_mktsegment"):
        cnt = grp.groupby("o_orderpriority").size()
        # tiebreak: count DESC then value ASC
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[seg] == (best[0], best[1])


def test_agg_grouping_sets_totals_are_consistent(spark, sf_dir):
    rows = _q("agg_grouping_sets")(spark, sf_dir).collect()
    by_gid = collections.defaultdict(list)
    for r in rows:
        by_gid[r["gid"]].append(r)
    # four grouping sets present, and each set's n_orders sums to the
    # grand total (every order lands in exactly one cell per set)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3][0]["n_orders"]
    assert len(by_gid[3]) == 1
    for gid in (0, 1, 2):
        assert sum(r["n_orders"] for r in by_gid[gid]) == grand


def test_data_quality_checks_clean_then_corrupted(spark, sf_dir, tmp_path):
    clean = {
        r["check_name"]: r["violations"]
        for r in _q("data_quality_checks")(spark, sf_dir).collect()
    }
    assert len(clean) == 6
    assert all(v == 0 for v in clean.values()), clean

    # corrupt a copy: dup customer PK, orphan order, orphan lineitem,
    # null custkey, negative price, nonpositive quantity
    d = tmp_path / "bad"
    d.mkdir()
    for t in ("region", "nation", "supplier", "part", "events",
              "documents", "embeddings"):
        shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    l = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pd.concat([c, c.iloc[[0]]]).to_parquet(d / "customer.parquet", index=False)
    bad_o = o.iloc[[0, 1, 2]].copy()
    bad_o["o_orderkey"] = [10_000_001, 10_000_002, 10_000_003]
    bad_o.loc[bad_o.index[0], "o_custkey"] = 99_999_999  # orphan FK
    bad_o.loc[bad_o.index[1], "o_custkey"] = None  # null key
    bad_o.loc[bad_o.index[2], "o_totalprice"] = -5.0
    pd.concat([o, bad_o]).to_parquet(d / "orders.parquet", index=False)
    bad_l = l.iloc[[0, 1]].copy()
    bad_l.loc[bad_l.index[0], "l_orderkey"] = 88_888_888  # orphan FK
    bad_l.loc[bad_l.index[1], "l_quantity"] = 0.0
    pd.concat([l, bad_l]).to_parquet(d / "lineitem.parquet", index=False)

    bad = {
        r["check_name"]: r["violations"]
        for r in _q("data_quality_checks")(spark, str(d)).collect()
    }
    assert bad == {
        "customer_pk_dup": 1,
        "orders_fk_orphan": 1,
        "orders_null_custkey": 1,
        "orders_price_negative": 1,
        "lineitem_fk_orphan": 1,
        "lineitem_qty_nonpositive": 1,
    }


def test_events_retention_offset_zero_is_full_cohort(spark, sf_dir):
    rows = _q("events_retention")(spark, sf_dir).collect()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = pd.to_datetime(e["ts"]).dt.date
    ud = pd.DataFrame({"user_id": e["user_id"], "day": day}).drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min()
    sizes = cohort.value_counts()
    at0 = {r["cohort_day"]: r for r in rows if r["day_offset"] == 0}
    # every cohort has an offset-0 row with retention exactly 1.0
    assert set(at0) == {str(d) for d in sizes.index}
    for dstr, r in at0.items():
        assert r["retention"] == pytest.approx(1.0)
        assert r["n_active"] == sizes[pd.Timestamp(dstr).date()]
    # spot-check one non-zero offset cell against pandas
    merged = ud.merge(cohort.rename("cohort_day"), on="user_id")
    merged["off"] = (
        pd.to_datetime(merged["day"]) - pd.to_datetime(merged["cohort_day"])
    ).dt.days
    pc = merged.groupby(["cohort_day", "off"])["user_id"].nunique()
    for r in rows[:20]:
        assert (
            pc[(pd.Timestamp(r["cohort_day"]).date(), r["day_offset"])]
            == r["n_active"]
        )


def test_text_repetition_matches_python(spark, sf_dir):
    rows = {r["doc_id"]: r for r in _q("text_repetition")(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, doc in docs.head(25).iterrows():
        toks = doc["text"].split(" ")
        dup = round(1.0 - len(set(toks)) / len(toks), 6)
        bi = collections.Counter(zip(toks, toks[1:]))
        top = round(max(bi.values()) / sum(bi.values()), 6) if bi else 0.0
        r = rows[doc["doc_id"]]
        assert r["dup_token_frac"] == pytest.approx(dup, abs=1e-9)
        assert r["top_bigram_frac"] == pytest.approx(top, abs=1e-9)


def test_text_boilerplate_ngrams_matches_python(spark, sf_dir):
    got = {
        r["shingle"]: r["n_docs"]
        for r in _q("text_boilerplate_ngrams")(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df_count = collections.Counter()
    for _, doc in docs.iterrows():
        toks = doc["text"].split(" ")
        df_count.update({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    want = {s: n for s, n in df_count.items() if n >= 4}
    assert got == want


def test_sim_range_search_complete_and_correct_vs_numpy(spark, sf_dir):
    rows = _q("sim_range_search")(spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qmask = ids % 25 == 0
    sims = unit[qmask] @ unit.T
    want = set()
    for qi, qid in enumerate(ids[qmask]):
        for ci, cid in enumerate(ids):
            if cid != qid and round(sims[qi, ci], 6) >= 0.35:
                want.add((qid, cid))
    got = {(r["q_id"], r["n_id"]) for r in rows}
    assert got == want  # completeness AND no spurious pairs
    for r in rows:
        qi = np.where(ids[qmask] == r["q_id"])[0][0]
        ci = np.where(ids == r["n_id"])[0][0]
        assert r["cosine"] == pytest.approx(sims[qi, ci], abs=1e-5)


def test_scd2_intervals_match_python_run_collapse(spark, sf_dir):
    rows = _q("scd2_intervals")(spark, sf_dir).collect()
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, g in e.groupby("user_id"):
        runs = []
        for _, r in g.iterrows():
            t = int(pd.Timestamp(r["ts"]).value // 1000)  # ns -> us
            if runs and runs[-1][0] == r["event_type"]:
                runs[-1][2] += 1
            else:
                runs.append([r["event_type"], t, 1])
        for i, (state, vfrom, n) in enumerate(runs):
            vto = runs[i + 1][1] if i + 1 < len(runs) else -1
            want.append((uid, state, vfrom, vto, n))
    got = {(r["user_id"], r["state"], r["valid_from"], r["valid_to"], r["run_events"]) for r in rows}
    assert got == set(want)
    # exactly one open interval per user
    open_per_user = collections.Counter(r["user_id"] for r in rows if r["valid_to"] == -1)
    assert all(v == 1 for v in open_per_user.values())


def test_ts_fill_forward_matches_pandas_ffill(spark, sf_dir):
    rows = _q("ts_fill_forward")(spark, sf_dir).collect()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e.sort_values(["user_id", "ts", "event_id"])
    e["day"] = pd.to_datetime(e["ts"]).dt.normalize()
    daily = e.groupby(["user_id", "day"]).last()["value"]
    got = {(r["user_id"], r["day"]): (r["v_fill"], r["gap"]) for r in rows}
    n_checked = 0
    for uid in e["user_id"].unique():
        s = daily.xs(uid, level="user_id")
        full = s.resample("1D").last()  # introduces NaN gaps
        filled = full.ffill()
        for day, v in filled.items():
            key = (uid, day.strftime("%Y-%m-%d"))
            assert key in got
            gv, gap = got[key]
            assert gv == pytest.approx(round(v, 6), abs=1e-9)
            assert gap == int(pd.isna(full[day]))
            n_checked += 1
    assert n_checked == len(rows)  # same grid, no extra cells


def test_window_range_interval_matches_pandas(spark, sf_dir):
    rows = _q("window_range_interval")(spark, sf_dir).collect()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    # astype("datetime64[ns]") pins the unit: pyarrow hands back
    # datetime64[us] for µs-encoded files, where int64 would be µs.
    sec = pd.to_datetime(e["ts"]).astype("datetime64[ns]").astype("int64") // 10**9
    df = pd.DataFrame({"event_id": e["event_id"], "user_id": e["user_id"],
                       "sec": sec, "value": e["value"]})
    got = {r["event_id"]: (r["roll3d_sum"], r["roll3d_n"]) for r in rows}
    for uid, g in list(df.groupby("user_id"))[:20]:
        g = g.sort_values("sec")
        for _, r in g.iterrows():
            win = g[(g["sec"] >= r["sec"] - 259200) & (g["sec"] <= r["sec"])]
            s, n = got[r["event_id"]]
            assert n == len(win)
            assert s == pytest.approx(round(win["value"].sum(), 6), abs=1e-6)


def test_text_collocations_pmi_matches_python(spark, sf_dir):
    rows = _q("text_collocations")(spark, sf_dir).collect()
    import math

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uni, big = collections.Counter(), collections.Counter()
    n1 = n2 = 0
    for t in docs["text"]:
        toks = t.split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
        n1 += len(toks)
        n2 += max(len(toks) - 1, 0)
    want = {}
    for (a, b), nab in big.items():
        if nab >= 5:
            want[(a, b)] = round(
                math.log((nab / n2) / ((uni[a] / n1) * (uni[b] / n1))), 6
            )
    got = {(r["w1"], r["w2"]): r["pmi"] for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_graph_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    rows = _q("graph_pagerank")(spark, sf_dir).collect()
    l = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_custkey"]]
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = {(s, c + 1_000_000) for s, c in zip(j["l_suppkey"], j["o_custkey"])}
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = collections.Counter(s for s, _ in edges)
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(10):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / deg[s]
        dangling = sum(r[idx[x]] for x in nodes if x not in deg)
        r = (1 - d) / n + d * dangling / n + d * contrib
    got = {row["node"]: row["rank"] for row in rows}
    assert set(got) == set(nodes)
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=2e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)


def test_recsys_als_shape_and_beats_popularity(spark, sf_dir):
    """ALS top-5 recs: exactly 5 ranked items per user with descending
    scores; same seed reproduces the same top-5 sets; and the recs hit
    actually-purchased items ABOVE the random base rate. The synthetic
    demand matrix is uniformly random (~18% dense, no latent structure
    by construction), so only weak lift is honestly assertable — the
    binding checks are shape + determinism."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.operators.recsys import purchase_matrix
    from flink_kmeans_spark.plans.registry import specs
    from flink_kmeans_spark.sources import load_table

    recs = specs()["recsys_als"].fn(spark, sf_dir)
    per_user = recs.groupBy("user").agg(
        F.count(F.lit(1)).alias("n"), F.max("rk").alias("maxrk")
    )
    bad = per_user.where((F.col("n") != 5) | (F.col("maxrk") != 5)).count()
    assert bad == 0
    # scores strictly non-increasing within each user's ranked list
    from pyspark.sql.window import Window

    w = Window.partitionBy("user").orderBy("rk")
    non_mono = (
        recs.withColumn("prev", F.lag("score").over(w))
        .where(F.col("prev").isNotNull() & (F.col("score") > F.col("prev")))
        .count()
    )
    assert non_mono == 0
    # same seed → same top-5 sets (rows-only determinism pin)
    again = specs()["recsys_als"].fn(spark, sf_dir)
    s1 = {(r["user"], r["item"]) for r in recs.collect()}
    s2 = {(r["user"], r["item"]) for r in again.collect()}
    assert s1 == s2
    # weak-lift: recs hit purchased items above the random base rate
    inter = purchase_matrix(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).cache()
    n_users = inter.select("user").distinct().count()
    n_items = inter.select("item").distinct().count()
    base_rate = inter.count() / (n_users * n_items)
    hits = recs.join(inter, ["user", "item"], "left_semi").count()
    hit_rate = hits / recs.count()
    assert hit_rate > base_rate, (hit_rate, base_rate)


def test_events_survival_curve_all_deaths_terminal_bucket(spark, tmp_path):
    """ADVICE r4 regression: when the max-lifetime bucket has
    deaths == n_at_risk (no censored user at max lifetime), the KM
    factor is exactly 0 — the unguarded formulation returned a stale
    product on Spark (ln(0)=NULL silently skipped by SUM) and raised
    OutOfRangeException on DuckDB. Both engines must now agree on
    surv = 0.0 from the first all-deaths bucket onward."""
    import duckdb

    # corpus_end = day 10. user 1: lifetime 5, dies (not active day 10).
    # user 2: lifetime 2, dies. user 3: lifetime 0, censored (active on
    # corpus_end). Max lifetime bucket t=5: deaths=1, n_at_risk=1.
    rows = [
        (1, "2024-01-01 00:00:00", 1),
        (2, "2024-01-06 00:00:00", 1),
        (3, "2024-01-02 00:00:00", 2),
        (4, "2024-01-04 00:00:00", 2),
        (5, "2024-01-11 00:00:00", 3),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["event_type"] = "view"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    out = _q("events_survival_curve")(spark, str(tmp_path)).orderBy("t")
    got = {r["t"]: r for r in out.collect()}
    assert set(got) == {0, 2, 5}
    # t=0: 1 censored of 3 at risk -> factor 1.0; t=2: 1 death of 2
    assert got[0]["surv"] == pytest.approx(1.0)
    assert got[2]["surv"] == pytest.approx(0.5)
    # terminal all-deaths bucket: surv exactly 0, not a stale 0.5
    assert got[5]["deaths"] == got[5]["n_at_risk"] == 1
    assert got[5]["surv"] == 0.0

    # and the DuckDB oracle runs clean (it used to raise) and matches
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    oracle = registry._SPECS["events_survival_curve"].oracle
    odf = con.execute(oracle).df().sort_values("t").reset_index(drop=True)
    assert list(odf["t"]) == [0, 2, 5]
    assert list(odf["surv"]) == pytest.approx([1.0, 0.5, 0.0])


def test_agg_ks_test_matches_numpy(spark, sf_dir):
    """KS statistic recomputed independently with numpy ECDFs."""
    got = _q("agg_ks_test")(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_totalprice"]]
    a = np.sort(o.loc[o.o_orderkey % 2 == 0, "o_totalprice"].to_numpy())
    b = np.sort(o.loc[o.o_orderkey % 2 == 1, "o_totalprice"].to_numpy())
    xs = np.union1d(a, b)
    d = np.abs(
        np.searchsorted(a, xs, side="right") / len(a)
        - np.searchsorted(b, xs, side="right") / len(b)
    ).max()
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["ks_d"] == pytest.approx(d, abs=1e-6)
    crit = 1.358 * ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5
    assert got["reject_05"] == int(d > crit)


def test_agg_chi2_matches_numpy(spark, sf_dir):
    """Chi-square statistic recomputed from a pandas crosstab."""
    got = _q("agg_chi2_independence")(spark, sf_dir).collect()[0]
    e = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "user_id"]]
    ct = pd.crosstab(e.event_type, e.user_id % 3)
    obs = ct.to_numpy().astype(float)
    exp = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp)[obs > 0].sum()  # only observed cells exist in the plan
    assert got["n_cells"] == int((obs > 0).sum())
    assert got["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert got["chi2"] == pytest.approx(chi2, abs=1e-4)


def test_events_bot_detection_thresholds_fire(spark, sf_dir):
    """The flag must actually split the population, and every flagged
    user must satisfy the stated predicate recomputed from raw data."""
    rows = _q("events_bot_detection")(spark, sf_dir).collect()
    flags = {r["user_id"]: r for r in rows}
    n_bots = sum(r["is_bot"] for r in rows)
    assert 0 < n_bots < len(rows)
    for r in rows:
        expect = int(r["rate_per_day"] > 2.6 or (r["n_events"] >= 20 and r["gap_cv"] < 0.8))
        # rounded columns can straddle the threshold the raw values used:
        # allow mismatch only within rounding distance of a boundary
        if expect != r["is_bot"]:
            near = abs(r["rate_per_day"] - 2.6) < 1e-3 or abs(r["gap_cv"] - 0.8) < 1e-3
            assert near, r


def test_ts_resample_ohlc_matches_pandas(spark, sf_dir):
    got = {
        (r["user_id"], r["day"]): (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in _q("ts_resample_ohlc")(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["day"] = e["ts"].dt.strftime("%Y-%m-%d")
    e = e.sort_values(["ts", "event_id"])
    exp = {}
    for (u, d), g in e.groupby(["user_id", "day"]):
        exp[(u, d)] = (
            round(g["value"].iloc[0], 6),
            round(g["value"].max(), 6),
            round(g["value"].min(), 6),
            round(g["value"].iloc[-1], 6),
            len(g),
        )
    assert got == exp


def test_graph_label_propagation_matches_python(spark, sf_dir):
    got = {
        r["part_id"]: r["community"]
        for r in _q("graph_label_propagation")(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    adj = collections.defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                adj[a].add(b)
                adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = collections.Counter(labels[m] for m in nbrs)
            # most frequent label, ties -> smallest label
            nxt[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        labels = nxt
    assert got == labels
    # communities are coarser than singletons on any co-purchase graph
    assert len(set(got.values())) < len(got)


def test_sink_zorder_envelopes_match_numpy(spark, sf_dir):
    rows = _q("sink_zorder")(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    day = o["o_orderdate"].dt.normalize()
    cmax = o["o_custkey"].max()
    dmin, dmax = day.min(), day.max()
    bx = np.minimum(np.floor(o["o_custkey"] * 256.0 / (cmax + 1)).astype("int64"), 255).to_numpy()
    span = (dmax - dmin).days + 1
    by = np.minimum(np.floor((day - dmin).dt.days * 256.0 / span).astype("int64"), 255).to_numpy()
    z = np.zeros(len(o), dtype="int64")
    for i in range(8):
        z |= ((bx >> i) & 1) << (2 * i)
        z |= ((by >> i) & 1) << (2 * i + 1)
    o = o.assign(z=z, zb=z // 1024, day=day)
    exp = {}
    for zb, g in o.groupby("zb"):
        exp[zb] = (
            len(g),
            g["o_custkey"].min(), g["o_custkey"].max(),
            g["day"].min().strftime("%Y-%m-%d"),
            g["day"].max().strftime("%Y-%m-%d"),
        )
    got = {
        r["zbucket"]: (r["n_rows"], r["cust_lo"], r["cust_hi"], r["day_lo"], r["day_hi"])
        for r in rows
    }
    assert got == exp
    # locality: every z-bucket's custkey envelope is a strict subset of
    # the full domain (the point of z-order: both dims stay bounded)
    assert all(hi - lo <= (cmax + 1) // 8 for (_, lo, hi, _, _) in got.values())


def test_embedding_mrl_truncate_matches_numpy(spark, sf_dir):
    got = {
        r["q_id"]: r["overlap5"]
        for r in _q("embedding_mrl_truncate")(spark, sf_dir).collect()
    }
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype("float64")
    ids = emb["vec_id"].to_numpy()

    def top5(M, qi):
        sims = (M @ M[qi]) / (
            np.linalg.norm(M, axis=1) * np.linalg.norm(M[qi]) + 1e-300
        )
        order = sorted(
            [(s, ids[j]) for j, s in enumerate(sims) if ids[j] != ids[qi]],
            key=lambda t: (-t[0], t[1]),
        )
        return {nid for _, nid in order[:5]}

    for qi in np.where(ids < 16)[0]:
        full = top5(V, qi)
        trunc = top5(V[:, :16], qi)
        assert got[ids[qi]] == len(full & trunc)


def test_text_feature_hashing_matches_python(spark, sf_dir):
    import hashlib

    got = {
        (r["doc_id"], r["feat_idx"]): r["val"]
        for r in _q("text_feature_hashing")(spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    exp = collections.Counter()
    for doc_id, text in zip(d["doc_id"], d["text"]):
        for tok in text.split(" "):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            sign = 1 if (h >> 10) % 2 == 0 else -1
            exp[(doc_id, h % 1024)] += sign
    exp = {k: v for k, v in exp.items() if v != 0}
    assert got == exp


def test_ts_changepoint_binseg_matches_numpy(spark, sf_dir):
    got = {
        r["event_type"]: (r["split_k"], r["stat"], r["mean_l"], r["mean_r"])
        for r in _q("ts_changepoint_binseg")(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["ts", "event_id"])
    for et, g in e.groupby("event_type"):
        v = g["value"].to_numpy()
        n = len(v)
        cum = np.cumsum(v)
        ks = np.arange(1, n)
        mean_l = cum[:-1] / ks
        mean_r = (cum[-1] - cum[:-1]) / (n - ks)
        stat = np.abs(mean_l - mean_r) * np.sqrt(ks * (n - ks) / n)
        best = int(np.argmax(stat))  # np.argmax takes first on ties = smallest k
        assert got[et][0] == best + 1
        assert got[et][1] == pytest.approx(round(stat[best], 6), abs=1e-6)
        assert got[et][2] == pytest.approx(round(mean_l[best], 6), abs=1e-6)
        assert got[et][3] == pytest.approx(round(mean_r[best], 6), abs=1e-6)


def test_geo_grid_knn_matches_python(spark, sf_dir):
    """Recompute the grid-bounded kNN with pure Python haversine over
    the same 3x3 cell neighborhood and compare the full (query,
    neighbor, rank) relation."""
    import math

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pts = {
        int(r.vec_id): (float(r.embedding[0]) * 100, float(r.embedding[1]) * 100)
        for r in emb.itertuples()
    }
    cell = 80.0 / math.ceil(math.sqrt(len(pts) / 20.0))
    cells = collections.defaultdict(list)
    for vid, (la, lo) in pts.items():
        cells[(math.floor(la / cell), math.floor(lo / cell))].append(vid)

    def hav(q, t):
        qla, qlo = pts[q]
        tla, tlo = pts[t]
        h = (
            math.sin(math.radians(tla - qla) / 2) ** 2
            + math.cos(math.radians(qla))
            * math.cos(math.radians(tla))
            * math.sin(math.radians(tlo - qlo) / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(h))

    want = {}
    for vid, (la, lo) in pts.items():
        cy, cx = math.floor(la / cell), math.floor(lo / cell)
        cand = [
            t
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            for t in cells.get((cy + dy, cx + dx), [])
            if t != vid
        ]
        ranked = sorted(cand, key=lambda t: (hav(vid, t), t))[:3]
        for rk, t in enumerate(ranked, 1):
            want[(vid, t)] = (rk, round(hav(vid, t), 4))
    got = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], r["dist_km"])
        for r in _q("geo_grid_knn")(spark, sf_dir).collect()
    }
    assert got == want


def test_mv_incremental_merge_equals_recompute(spark, sf_dir):
    """merge(base, delta) must equal the full pandas recompute — and
    the split must actually cut the data (both partials non-empty)."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["ym"] = o["o_orderdate"].dt.strftime("%Y-%m")
    n_base = (o["o_orderdate"] < "1997-01-01").sum()
    assert 0 < n_base < len(o)
    exp = {
        (ym, st): (len(g), round(g["o_totalprice"].sum(), 2))
        for (ym, st), g in o.groupby(["ym", "o_orderstatus"])
    }
    got = {
        (r["ym"], r["o_orderstatus"]): (r["cnt"], r["total"])
        for r in _q("mv_incremental_agg")(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k, (cnt, tot) in exp.items():
        assert got[k][0] == cnt
        assert got[k][1] == pytest.approx(tot, abs=0.02)


def test_ts_seasonal_decompose_matches_pandas(spark, sf_dir):
    """Recompute trend/seasonal/resid with pandas rolling + groupby and
    check the decomposition identity value = trend + seasonal + resid."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.assign(day=o["o_orderdate"].dt.normalize())
        .groupby("day")["o_totalprice"]
        .sum()
        .sort_index()
    )
    trend = daily.rolling(7, center=True, min_periods=1).mean()
    dow = (daily.index.dayofweek + 1) % 7  # pandas Mon=0 -> DuckDB Sun=0
    detr = daily - trend
    s0 = detr.groupby(dow).mean()
    seas = s0 - s0.mean()
    rows = _q("ts_seasonal_decompose")(spark, sf_dir).collect()
    assert len(rows) == len(daily)
    got = {r["day"]: r for r in rows}
    for day, val in daily.items():
        key = day.strftime("%Y-%m-%d")
        r = got[key]
        d = (day.dayofweek + 1) % 7
        assert r["value"] == pytest.approx(round(val, 2), abs=0.02)
        assert r["trend"] == pytest.approx(trend[day], abs=0.02)
        assert r["seasonal"] == pytest.approx(seas[d], abs=0.02)
        assert r["value"] - r["trend"] - r["seasonal"] == pytest.approx(
            r["resid"], abs=0.05
        )


def test_agg_kmv_setops_matches_python(spark, sf_dir):
    """Recompute exact + KMV union/intersection estimates from raw
    events with hashlib md5 and assert the sketch algebra row-for-row;
    the union estimate must also genuinely sit in its corridor here."""
    import hashlib

    e = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "user_id"]]
    users = {t: set(g["user_id"]) for t, g in e.groupby("event_type")}

    def h60(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    sk = {
        t: sorted(h60(u) for u in us)[:64] for t, us in users.items()
    }
    got = {
        (r["type_a"], r["type_b"]): r
        for r in _q("agg_kmv_setops")(spark, sf_dir).collect()
    }
    types = sorted(users)
    n_pairs = 0
    for i, a in enumerate(types):
        for b_ in types[i + 1:]:
            n_pairs += 1
            r = got[(a, b_)]
            exact_i = len(users[a] & users[b_])
            exact_u = len(users[a] | users[b_])
            assert r["exact_inter"] == exact_i
            assert r["exact_union"] == exact_u
            merged = sorted(set(sk[a]) | set(sk[b_]))
            mu = len(merged)
            if mu < 64:
                est_u = float(mu)
                k_both = len(set(sk[a]) & set(sk[b_]))
                est_i = float(k_both)
            else:
                x64 = merged[63]
                est_u = 63.0 / (x64 / float(1 << 60))
                k_both = sum(
                    1 for hv in merged[:64] if hv in set(sk[a]) and hv in set(sk[b_])
                )
                est_i = (k_both / 64.0) * est_u
            assert r["est_union"] == pytest.approx(round(est_u, 4), abs=1e-3)
            assert r["est_inter"] == pytest.approx(round(est_i, 4), abs=1e-3)
            assert r["union_in_corridor"] == (abs(est_u - exact_u) / exact_u <= 0.35)
            assert r["union_in_corridor"]  # the sketch must actually be good here
    assert len(got) == n_pairs


def test_graph_shortest_paths_matches_python_bfs(spark, sf_dir):
    """Recompute 3-hop BFS distances from the 3 landmark sources with a
    pure-Python adjacency walk."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    adj = collections.defaultdict(set)
    for _, g in li.drop_duplicates().groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                adj[a].add(b)
                adj[b].add(a)
    nodes = sorted(adj)
    srcs = nodes[:3]
    want = {}
    for s in srcs:
        dist = {s: 0}
        frontier = [s]
        for depth in (1, 2, 3):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
            frontier = nxt
        for node, d_ in dist.items():
            want[(s, node)] = d_
    got = {
        (r["source_part"], r["part_id"]): r["dist"]
        for r in _q("graph_shortest_paths")(spark, sf_dir).collect()
    }
    assert got == want


def test_ts_autocorrelation_matches_pandas(spark, sf_dir):
    """Recompute the lag-1..7 pairwise-complete Pearson ACF with
    pandas Series.corr over shifted copies."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.assign(day=o["o_orderdate"].dt.normalize())
        .groupby("day")["o_totalprice"]
        .sum()
        .sort_index()
    )
    r = _q("ts_autocorrelation")(spark, sf_dir).collect()[0]
    assert r["n_days"] == len(daily)
    for lag in range(1, 8):
        want = daily.corr(daily.shift(lag))
        assert r[f"acf{lag}"] == pytest.approx(round(want, 4), abs=2e-4)


def test_data_kanonymity_matches_pandas(spark, sf_dir):
    """Recompute every report column from a pandas quasi-identifier
    groupby."""
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    g = (
        c.assign(band=np.floor(c["c_acctbal"] / 1000).astype(int))
        .groupby(["c_nationkey", "c_mktsegment", "band"])
        .size()
    )
    r = _q("data_kanonymity")(spark, sf_dir).collect()[0]
    assert r["n_groups"] == len(g)
    assert r["groups_below_k"] == int((g < 5).sum())
    assert r["rows_at_risk"] == int(g[g < 5].sum())
    assert r["n_rows"] == len(c)
    assert r["risk_rate"] == pytest.approx(g[g < 5].sum() / len(c), abs=1e-5)
    assert r["min_group"] == int(g.min())
    assert r["unique_rows"] == int((g == 1).sum())


def test_graph_shuffle_branch_bit_identical(spark, sf_dir):
    """VERDICT r6 item 2: the ≥10⁶-node SHUFFLE branch of every
    iterative graph operator (the branch that actually runs at 100 TB)
    had never executed at test scale — every testdata graph is tiny,
    so `bcast` was always True. Force broadcast_nodes_max=0 and assert
    the shuffle plan produces the SAME answer as the broadcast plan on
    the same graph.

    Components and LPA are integer min/argmax fixpoints — order-
    insensitive, so equality is exact. PageRank sums floats whose
    partial-aggregation order is nondeterministic even WITHIN a branch,
    so it gets a 1e-9 tolerance."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.operators.graph import (
        connected_components,
        pagerank,
    )
    from flink_kmeans_spark.plans.analytics import graph_label_propagation

    # --- connected components: 200 five-node chains (diameter 4,
    #     converges inside the 10-round label-propagation budget) ---
    nodes = spark.range(1000).select(F.col("id"))
    pairs = (
        spark.range(1000)
        .filter(F.col("id") % 5 != 4)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    bc = connected_components(nodes, pairs).collect()
    sh = connected_components(nodes, pairs, broadcast_nodes_max=0).collect()
    assert sorted(map(tuple, bc)) == sorted(map(tuple, sh))
    # and both equal the closed form: component = floor(id/5)*5
    assert {(r["id"], r["component"]) for r in sh} == {
        (i, (i // 5) * 5) for i in range(1000)
    }

    # --- pagerank: deterministic synthetic digraph, 500 nodes ---
    edges = (
        spark.range(500)
        .select(
            F.col("id").alias("src"),
            ((F.col("id") * 7 + 3) % 500).alias("dst"),
        )
        .unionByName(
            spark.range(500).select(
                F.col("id").alias("src"), ((F.col("id") + 1) % 500).alias("dst")
            )
        )
    )
    pr_bc = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=5).collect()}
    pr_sh = {
        r["node"]: r["rank"]
        for r in pagerank(edges, n_iter=5, broadcast_nodes_max=0).collect()
    }
    assert set(pr_bc) == set(pr_sh)
    for k, v in pr_bc.items():
        assert abs(v - pr_sh[k]) < 1e-9, (k, v, pr_sh[k])

    # --- LPA: the registered key's own graph, both strategies ---
    lpa_bc = graph_label_propagation(spark, sf_dir).collect()
    lpa_sh = graph_label_propagation(
        spark, sf_dir, broadcast_nodes_max=0
    ).collect()
    assert sorted(map(tuple, lpa_bc)) == sorted(map(tuple, lpa_sh))


def test_components_star_shuffle_equals_broadcast_fallback(spark):
    """The star-contraction fallback (long-chain graphs) must also be
    strategy-independent: a 60-node chain exceeds the 10-round
    min-propagation budget, forcing connected_components into
    connected_components_star — run that whole path with broadcasting
    effectively disabled via broadcast_nodes_max=0 and compare."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.operators.graph import connected_components

    nodes = spark.range(60).select(F.col("id"))
    pairs = (
        spark.range(59)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    bc = connected_components(nodes, pairs).collect()
    sh = connected_components(nodes, pairs, broadcast_nodes_max=0).collect()
    assert sorted(map(tuple, bc)) == sorted(map(tuple, sh))
    assert {r["component"] for r in sh} == {0}


def test_epoch_shuffle_permutes_and_is_partitioning_invariant(spark, sf_dir):
    """(a) each epoch covers every doc exactly once with contiguous
    per-shard positions; (b) epochs are DIFFERENT permutations; (c) the
    output is byte-identical when the input is repartitioned — the
    promise rand()-based shuffles cannot make."""
    fn = registry.specs()["data_epoch_shuffle"].fn
    rows = fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    by_epoch = collections.defaultdict(list)
    for r in rows:
        by_epoch[r["epoch"]].append(r)
    assert set(by_epoch) == {1, 2}
    orders = {}
    for ep, rs in by_epoch.items():
        assert {r["doc_id"] for r in rs} == docs
        shard_pos = collections.defaultdict(list)
        for r in rs:
            shard_pos[r["shard"]].append(r["pos"])
        for ps in shard_pos.values():
            assert sorted(ps) == list(range(1, len(ps) + 1))
        orders[ep] = [
            r["doc_id"]
            for r in sorted(rs, key=lambda x: (x["shard"], x["pos"]))
        ]
    assert orders[1] != orders[2], "epoch salt produced identical order"
    # partitioning invariance: run over a repartitioned copy
    import tempfile

    with tempfile.TemporaryDirectory(dir=SCRATCH_DIR) as td:
        spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
            7
        ).write.parquet(f"{td}/documents.parquet")
        again = fn(spark, td).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pareto_skyline_vs_bruteforce(spark, sf_dir):
    """Brute-force O(N²) dominance over the full sf0.001 part table
    must reproduce the windowed two-phase skyline exactly."""
    pdf = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size")
        .toPandas()
    )
    pts = list(
        zip(pdf["p_partkey"], pdf["p_retailprice"].astype(float), pdf["p_size"])
    )
    want = set()
    for k, pr, sz in pts:
        dominated = any(
            (qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz))
            for _, qpr, qsz in pts
        )
        if not dominated:
            want.add((k, round(pr, 2), sz))
    got = {
        (r["p_partkey"], r["price"], r["size"])
        for r in registry.specs()["pareto_skyline"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_heavy_hitters_mg_bounds(spark, sf_dir):
    """The MG guarantees, recomputed independently in pandas:
    (a) est ≤ exact for every reported key; (b) exact − est ≤ err_max;
    (c) err_max ≤ n/(K+1) summed per shard; (d) the true top-1 user
    (whose count exceeds err_max on this corpus) is reported."""
    import hashlib

    rows = (
        registry.specs()["agg_heavy_hitters_mg"].fn(spark, sf_dir).collect()
    )
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .toPandas()
    )
    exact = ev["user_id"].value_counts()
    err_max = rows[0]["err_max"]

    def shard(k):
        return int(hashlib.md5(f"{k}#mg".encode()).hexdigest()[:15], 16) % 8

    ev["shard"] = ev["user_id"].map(shard)
    shard_tot = ev.groupby("shard").size()
    assert err_max <= sum(n // (16 + 1) for n in shard_tot)
    for r in rows:
        assert r["est"] <= r["exact_n"] == exact[r["user_id"]]
        assert r["exact_n"] - r["est"] <= err_max
    top1 = exact.index[0]
    if exact.iloc[0] > err_max:
        assert any(r["user_id"] == top1 for r in rows)


def test_ts_holt_linear_structure(spark, sf_dir):
    """Forecasts are collinear on the fitted trend line, SSE is
    non-negative, the trailing-window cap holds, and the recursion
    matches an independent pandas replay of the raw bucket counts."""
    import pandas as pd
    from flink_kmeans_spark.plans.registry import specs
    from flink_kmeans_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = specs()["ts_holt_linear"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_steps"] <= 600
        assert r["sse"] >= 0
        assert abs((r["f2"] - r["f1"]) - (r["f3"] - r["f2"])) < 1e-5
        assert abs((r["f1"] - r["level"]) - r["trend"]) < 1e-5

    e = load_table(spark, sf_dir, "events")
    pdf = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .select("event_type", F.unix_micros(F.col("w.start")).alias("w"), "y")
        .toPandas()
    )
    got = {r["event_type"]: (r["level"], r["trend"], r["sse"]) for r in rows}
    for et, g in pdf.groupby("event_type"):
        ys = g.sort_values("w")["y"].tolist()[-600:]
        l, b, sse = float(ys[0]), 0.0, 0.0
        for y in ys[1:]:
            f = l + b
            ln = 0.5 * y + 0.5 * f
            b = 0.3 * (ln - l) + 0.7 * b
            l = ln
            sse += (y - f) * (y - f)
        assert got[et] == (round(l, 6), round(b, 6), round(sse, 4))


def test_agg_ttest_welch_replay(spark, sf_dir):
    """t statistic and Welch–Satterthwaite df match an independent
    numpy replay from the raw events; symmetric-arm sanity (swapping
    arms flips the sign)."""
    import numpy as np
    from flink_kmeans_spark.plans.registry import specs
    from flink_kmeans_spark.sources import load_table

    rows = specs()["agg_ttest_welch"].fn(spark, sf_dir).collect()
    assert rows
    pdf = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .toPandas()
    )
    for r in rows:
        g = pdf[pdf.event_type == r["event_type"]]
        a = g[g.user_id % 2 == 0].value.to_numpy()
        b = g[g.user_id % 2 != 0].value.to_numpy()
        assert (len(a), len(b)) == (r["n_a"], r["n_b"])
        sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(sa + sb)
        df = (sa + sb) ** 2 / (
            sa**2 / (len(a) - 1) + sb**2 / (len(b) - 1)
        )
        assert abs(r["t_stat"] - round(t, 4)) <= 1e-4
        assert abs(r["df"] - round(df, 2)) <= 0.01
        # df is bounded by the classical pooled limits
        assert min(len(a), len(b)) - 1 <= r["df"] <= len(a) + len(b) - 2


def test_agg_quantile_sketch_error_bound_and_merge(spark, sf_dir):
    """DDSketch guarantee: est within relative error alpha of the exact
    order statistic at rank floor(q*(n-1)); and the sketch MERGES —
    building per-half bucket tables and re-summing counts must equal
    the single-pass sketch exactly (the mergeable-summaries property
    the key exists to demonstrate)."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.plans.analytics import (
        _DDS_ALPHA,
        _DDS_QS,
        _dds_buckets,
    )

    got = {r["q"]: r for r in _q("agg_quantile_sketch")(spark, sf_dir).collect()}
    x = np.sort(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet")["l_extendedprice"].to_numpy()
    )
    assert got[0.5]["n"] == len(x)
    for q in _DDS_QS:
        r = got[q]
        exact = x[int(np.floor(q * (len(x) - 1)))]
        assert r["qrank"] == int(np.floor(q * (len(x) - 1)))
        rel = abs(r["est"] - exact) / exact
        assert rel <= _DDS_ALPHA + 1e-9, (q, r["est"], exact, rel)

    # merge associativity: sketch(half A) + sketch(half B) == sketch(all)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", F.col("l_extendedprice").cast("double").alias("x")
    )
    full = {
        r["bucket"]: r["c"]
        for r in _dds_buckets(li.select("x")).collect()
    }
    a = _dds_buckets(li.filter(F.col("l_orderkey") % 2 == 0).select("x"))
    b = _dds_buckets(li.filter(F.col("l_orderkey") % 2 == 1).select("x"))
    merged = {
        r["bucket"]: r["c"]
        for r in a.union(b).groupBy("bucket").agg(F.sum("c").alias("c")).collect()
    }
    assert merged == full


def test_graph_kcore_matches_unbounded_python_peel(spark, sf_dir):
    """The registered 4-round peel state must equal the TRUE k-core
    (unbounded pure-Python peel to fixpoint), node set AND within-core
    degrees — proving R=4 covers the fixpoint at this scale."""
    from flink_kmeans_spark.plans.analytics import _KCORE_K

    got = {
        r["part_id"]: r["core_deg"]
        for r in _q("graph_kcore")(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    adj = {}
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"].unique())
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        nxt = {u for u in alive if sum(1 for v in adj[u] if v in alive) >= _KCORE_K}
        if nxt == alive:
            break
        alive = nxt
    want = {
        int(u): sum(1 for v in adj[u] if v in alive) for u in alive
    }
    assert got == want
    # and the peel actually removed something (the key is not a no-op)
    assert len(alive) < len(adj)


def test_graph_kcore_shuffle_branch_bit_identical(spark, sf_dir):
    """The >=10^6-node shuffle branch of graph_kcore (the one a 100 TB
    graph runs) must produce the same exact-integer answer as the
    broadcast branch — the same discipline as
    test_graph_shuffle_branch_bit_identical."""
    from flink_kmeans_spark.plans.analytics import graph_kcore

    bc = sorted(
        (r["part_id"], r["core_deg"])
        for r in graph_kcore(spark, sf_dir).collect()
    )
    sh = sorted(
        (r["part_id"], r["core_deg"])
        for r in graph_kcore(spark, sf_dir, broadcast_nodes_max=0).collect()
    )
    assert bc == sh and bc
