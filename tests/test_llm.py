"""LLM-pipeline operator tests — in-repo oracles for the keys the
DuckDB gate can't express (sketches, LSH, UDF surface, media stubs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_kmeans_spark.operators import dedup as DD
from flink_kmeans_spark.operators import multimodal as MM
from flink_kmeans_spark.operators import similarity as SIM
from flink_kmeans_spark.plans.registry import specs
from flink_kmeans_spark.sources import load_table
from conftest import SCRATCH_DIR


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def exact_jaccard_pairs(spark, docs, threshold):
    """Exact 3-gram Jaccard over ALL pairs, computed in pandas."""
    pdf = docs.select("doc_id", "text").toPandas()
    sh = {
        r.doc_id: set(
            " ".join(toks[i : i + 3])
            for toks in [r.text.split(" ")]
            for i in range(max(len(toks) - 2, 0))
        )
        for r in pdf.itertuples()
    }
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / len(sh[a] | sh[b])
                if j >= threshold:
                    out[(a, b)] = j
    return out


def test_minhash_estimates_track_exact_jaccard(spark, docs):
    exact = exact_jaccard_pairs(spark, docs, 0.0)
    got = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in DD.minhash_candidate_pairs(docs, num_hashes=32, bands=8).collect()
    }
    # every true high-similarity pair must be FOUND (recall at J>=0.8)
    high = {p for p, j in exact.items() if j >= 0.8}
    assert high <= set(got), f"missed near-dup pairs: {high - set(got)}"
    # estimates within 0.25 of exact for found pairs (32 hashes -> se ~0.09)
    for p, est in got.items():
        assert abs(est - exact.get(p, 0.0)) < 0.25, (p, est, exact.get(p))


def test_simhash_finds_exact_duplicates(spark, docs):
    """Identical texts have identical simhash → hamming 0; all exact-dup
    pairs must appear in the banded candidate output.

    The corpus has NO byte-exact dup texts (measured: 500 distinct texts
    at sf0.001/sf0.01 — FIXTURES.md's 'duplicates' are near-dups only),
    so exact dups are synthesized by re-appending 10 docs with new ids."""
    base = docs.select("doc_id", "text").limit(10)
    clones = base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    with_dups = docs.select("doc_id", "text").unionByName(clones)
    dup_pairs = {
        (r.doc_id, r.doc_id + 100000) for r in base.collect()
    }
    got = DD.simhash_candidate_pairs(with_dups, max_hamming=3).collect()
    got_pairs = {(r.id_a, r.id_b) for r in got}
    assert dup_pairs <= got_pairs, dup_pairs - got_pairs
    zero = {(r.id_a, r.id_b) for r in got if r.hamming == 0}
    assert dup_pairs <= zero


def test_cluster_rep_matches_union_find(spark, sf_dir, docs):
    """Connected components must equal a python union-find on the same
    candidate pairs (component id = min member id)."""
    from flink_kmeans_spark.operators.graph import dedup_cluster_representatives

    pairs_df = DD.minhash_candidate_pairs(docs, num_hashes=32, bands=8).filter(
        F.col("jaccard_est") >= 0.5
    )
    pairs = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    ids = [r.doc_id for r in docs.select("doc_id").collect()]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in ids}

    got = {
        r.doc_id: r.rep_id
        for r in dedup_cluster_representatives(docs, pairs_df).collect()
    }
    assert got == expected


def test_ivf_topk_recall_vs_bruteforce(spark, emb):
    q = emb.orderBy("vec_id").limit(10)
    exact = SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = SIM.ivf_topk(emb, q, k=5, n_clusters=16, nprobe=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.n_id)
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.n_id)
    recalls = [
        len(exact_sets[q_] & approx_sets.get(q_, set())) / 5 for q_ in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_lsh_topk_recall_vs_bruteforce(spark, emb):
    q = emb.orderBy("vec_id").limit(10)
    exact = SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = SIM.lsh_topk(emb, q, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.n_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.n_id)
    recalls = [
        len(exact_sets[q_] & approx_sets.get(q_, set())) / 5 for q_ in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_hnsw_lite_topk_recall_vs_bruteforce(spark, emb):
    """Beam search over the NN-Descent-refined graph must beat the flat
    LSH floor: measured mean recall@5 = 0.9 at sf0.01 (r11) — floor
    pinned at 0.7 with per-query shape checks (k rows, ranked)."""
    q = emb.orderBy("vec_id").limit(10)
    exact = SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = SIM.hnsw_lite_topk(emb, q, k=5).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.n_id)
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.n_id)
    assert all(len(s) == 5 for s in approx_sets.values())
    recalls = [
        len(exact_sets[q_] & approx_sets.get(q_, set())) / 5 for q_ in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_udf_surface_matches_builtins(spark, sf_dir, emb):
    got = {r.label: r for r in specs()["udf_surface"].fn(spark, sf_dir).collect()}
    v = F.col("embedding").cast("array<double>")
    builtin = {
        r.label: r
        for r in emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array(*[F.avg(v[i]) for i in range(64)]).alias("centroid"),
        )
        .collect()
    }
    for label, b in builtin.items():
        g = got[label]
        assert g.n == b.n
        cn = float(np.sqrt((np.array(b.centroid) ** 2).sum()))
        # query output is rounded to 6 dp (oracle float discipline)
        assert g.centroid_norm == pytest.approx(cn, abs=5e-7)
        assert g.mean_vec_dim == 64


def test_multimodal_decode_real_kernel(spark, sf_dir, docs):
    out = (
        specs()["multimodal_decode"].fn(spark, sf_dir).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    src = docs.select("doc_id").toPandas()
    assert len(out) == len(src)
    # decoded geometry must equal the generator formula — proves the
    # executor-side PNG parse recovered the real header
    did = out["doc_id"]
    assert (out["width"] == 4 + did % 13).all()
    assert (out["height"] == 3 + did % 11).all()
    assert (out["n_pixels"] == out["width"] * out["height"]).all()
    assert (out["fmt"] == "png").all()
    assert out["mean_pixel"].between(0, 255).all()


def test_png_codec_roundtrip_all_filters():
    import random

    from flink_kmeans_spark.functions.imagecodec import (
        decode_png,
        encode_png_gray,
        probe_image,
    )

    rng = random.Random(42)
    for ft in range(5):  # force each scanline filter type in isolation
        w, h = rng.randint(1, 33), rng.randint(1, 29)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        data = encode_png_gray(w, h, px, filter_for_row=lambda y: ft)
        assert probe_image(data) == ("png", w, h)
        assert decode_png(data) == (w, h, px)
    # corrupt CRC must fail loudly, never emit plausible pixels
    data = bytearray(encode_png_gray(4, 4, bytes(range(16))))
    data[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_probe_image_foreign_formats():
    import struct

    from flink_kmeans_spark.functions.imagecodec import probe_image

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 20
    jpg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x00" * 10 + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x00" * 12
    )
    assert probe_image(gif) == ("gif", 320, 200)
    assert probe_image(bmp) == ("bmp", 640, 480)  # abs() of top-down height
    assert probe_image(jpg) == ("jpeg", 640, 480)
    assert probe_image(b"not an image") == (None, -1, -1)


def test_frame_sample_cardinality(spark, docs):
    media = MM.to_media_table(docs.limit(20))
    frames = MM.frame_sample(media, frames_per_doc=3).toPandas()
    assert len(frames) == 60
    assert set(frames["frame_idx"]) == {0, 1, 2}


def test_tfidf_norms_positive_and_deterministic(spark, sf_dir):
    out = specs()["text_tfidf"].fn(spark, sf_dir).toPandas().sort_values("doc_id")
    assert (out["tfidf_norm"] > 0).all()
    # deterministic across invocations (IDF fit + hashing are seed-free)
    again = specs()["text_tfidf"].fn(spark, sf_dir).toPandas().sort_values("doc_id")
    np.testing.assert_allclose(
        out["tfidf_norm"].to_numpy(), again["tfidf_norm"].to_numpy(), rtol=0
    )


def test_shingles_short_docs_yield_empty_not_crash(spark):
    # regression: docs with < n tokens used to hit sequence(1,0) -> [1,0]
    # descending + slice(toks, 0, n) -> INVALID_PARAMETER_VALUE.START
    from flink_kmeans_spark.functions.text import shingles

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "exactly three tokens"),
         (4, "now four tokens here"), (5, "")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert got[1] == [] and got[2] == [] and got[5] == []
    assert got[3] == ["exactly three tokens"]
    assert len(got[4]) == 2
    # and the dedup pipelines built on shingles survive short docs
    pairs = DD.minhash_candidate_pairs(
        df.withColumnRenamed("text", "text"), num_hashes=8, bands=4
    )
    pairs.collect()
    DD.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()


def test_connected_components_falls_back_to_star_when_unconverged(spark):
    # diameter-4 chain cannot converge via label propagation in one
    # round: instead of raising (round-2 behavior) it must hand off to
    # the alternating-star algorithm and still return correct components
    from flink_kmeans_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    ok = connected_components(nodes, chain, max_iter=1)
    assert {r["component"] for r in ok.collect()} == {0}
    ok = connected_components(nodes, chain, max_iter=10)
    assert {r["component"] for r in ok.collect()} == {0}


def test_connected_components_star_high_diameter_chain(spark):
    # diameter-50 chain (plus a second shifted chain and isolated
    # nodes): min-label propagation would need 50 rounds; the star
    # variant converges in O(log d) and must label every chain member
    # with its minimum. The round-2 implementation raised here.
    from flink_kmeans_spark.operators.graph import connected_components_star

    n = 51
    edges = [(i, i + 1) for i in range(n - 1)]  # component min 0
    edges += [(100 + i, 101 + i) for i in range(20)]  # component min 100
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)]
        + [(100 + i,) for i in range(21)]
        + [(999,)],  # isolated node labels itself
        "id long",
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(nodes, pairs).collect()
    }
    assert all(got[i] == 0 for i in range(n))
    assert all(got[100 + i] == 100 for i in range(21))
    assert got[999] == 999


def test_connected_components_star_matches_label_propagation(spark):
    import random

    from flink_kmeans_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    ids = list(range(60))
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(45)
    ]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {
        r["id"]: r["component"]
        for r in connected_components(nodes, pairs, max_iter=30).collect()
    }
    b = {
        r["id"]: r["component"]
        for r in connected_components_star(nodes, pairs).collect()
    }
    assert a == b


def test_pq_topk_recall_vs_bruteforce(spark, emb):
    q = emb.orderBy("vec_id").limit(10)
    exact = SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = SIM.pq_topk(emb, q, k=5).collect()
    es, asets = {}, {}
    for r in exact:
        es.setdefault(r.q_id, set()).add(r.n_id)
    for r in approx:
        asets.setdefault(r.q_id, set()).add(r.n_id)
    recalls = [len(es[q_] & asets.get(q_, set())) / 5 for q_ in es]
    # measured 0.78 mean at m=16, nc=256 (16-byte codes); floor with margin
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_wav_codec_roundtrip_and_guards():
    import random
    import struct

    from flink_kmeans_spark.functions.audiocodec import (
        decode_wav,
        encode_wav_pcm16,
    )

    rng = random.Random(7)
    for _ in range(5):
        rate = rng.choice([8000, 16000, 44100])
        samples = [rng.randint(-32768, 32767) for _ in range(rng.randint(1, 500))]
        data = encode_wav_pcm16(rate, samples)
        assert decode_wav(data) == (rate, samples)
    # decoder must skip unknown chunks (word-aligned) and still find data
    base = encode_wav_pcm16(8000, [1, -2, 3])
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    patched = bytearray(base[:12] + extra + base[12:])
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    assert decode_wav(bytes(patched)) == (8000, [1, -2, 3])
    # corruption fails loudly, never plausible samples
    for bad in (b"xx", base[:30], base.replace(b"WAVE", b"AIFF")):
        with pytest.raises(ValueError):
            decode_wav(bytes(bad))
    # stereo/non-PCM rejected (we only claim PCM16 mono)
    stereo = bytearray(base)
    i = stereo.index(b"fmt ") + 8
    stereo[i + 2 : i + 4] = struct.pack("<H", 2)  # channels=2
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(stereo))


def test_video_frame_archive_selective_decode(spark, sf_dir):
    """Sampled frames only: stride-2 over n_frames yields
    ceil(n_frames/2) rows per doc, and each sampled frame's pixels
    decode to the deterministic generation values."""
    from pyspark.sql import functions as F

    from flink_kmeans_spark.plans.registry import specs

    out = specs()["multimodal_video_framesample"].fn(spark, sf_dir).toPandas()
    per = out.groupby("doc_id").agg(n=("frame_idx", "size"), nf=("n_frames", "max"))
    assert (per["n"] == (per["nf"] + 1) // 2).all()
    assert (out["frame_idx"] % 2 == 0).all()
    assert out["mean_pixel"].between(0, 255).all()


def test_dedup_line_level_conservation(spark, sf_dir):
    """Line-level dedup invariants: kept-line counts bound by totals,
    owners keep everything, and cleaned_text token count == 5*kept-ish
    (last line may be short); total kept lines == total lines minus
    non-owner copies of duplicated lines."""
    out = {r["doc_id"]: r for r in specs()["dedup_line_level"].fn(spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    import math

    # recompute expected with plain python
    lines = {}
    for did, text in docs.items():
        w = text.split(" ")
        ls = [" ".join(w[i * 5 : i * 5 + 5]) for i in range(math.ceil(len(w) / 5))]
        lines[did] = ls
    owner, ndocs = {}, {}
    for did, ls in lines.items():
        for l in set(ls):
            owner[l] = min(owner.get(l, did), did)
            ndocs[l] = ndocs.get(l, 0) + 1
    for did, ls in lines.items():
        kept = [l for l in ls if ndocs[l] < 2 or owner[l] == did]
        r = out[did]
        assert r["n_lines"] == len(ls)
        assert r["n_kept"] == len(kept), did
        assert r["cleaned_text"] == " ".join(kept), did


def test_multimodal_phash_identical_images_collide(spark, sf_dir):
    """dHash must be invariant to the PAYLOAD bytes given equal pixels:
    re-encoding the same pixel grid with different scanline filters
    yields identical hashes (the property that makes it a perceptual
    near-dup key rather than a byte hash)."""
    import pandas as pd

    from flink_kmeans_spark.functions.imagecodec import encode_png_gray
    from flink_kmeans_spark.operators import multimodal as MM

    w, h = 9, 8
    px = bytes((i * 37) % 256 for i in range(w * h))
    pay_a = encode_png_gray(w, h, px, filter_for_row=lambda y: 0)
    pay_b = encode_png_gray(w, h, px, filter_for_row=lambda y: (y + 1) % 5)
    assert pay_a != pay_b  # different bytes on the wire
    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [pay_a, pay_b]})
    )
    got = {r["doc_id"]: r["dhash"] for r in MM.dhash_image_media(media).collect()}
    assert got[1] == got[2] and len(got[1]) == 64 and set(got[1]) <= {"0", "1"}


def test_js_divergence_bounds_and_sanity(spark, sf_dir):
    """JSD of same-corpus halves: tiny but positive, and always below
    the ln 2 ceiling; identical distributions give exactly 0."""
    import math

    r = specs()["text_js_divergence"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["jsd_nats"] < math.log(2), r
    # identical halves -> 0 exactly (every p0 == p1 term vanishes)
    import pandas as pd

    from flink_kmeans_spark.plans import llm as L

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "a b c"],
                      "lang": ["en", "en"]})
    )
    import flink_kmeans_spark.plans.llm as llm_mod
    # reuse the registered fn through a temp view-compatible path:
    # build the same computation inline on the two-doc frame
    from pyspark.sql import functions as F
    tok = docs.select((F.col("doc_id") % 2).alias("half"),
                      F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"))
    tot = cnt.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"),
                  F.count(F.lit(1)).alias("v"))
    p = cnt.crossJoin(F.broadcast(tot)).select(
        ((F.col("c0") + 1.0) / (F.col("n0") + F.col("v"))).alias("p0"),
        ((F.col("c1") + 1.0) / (F.col("n1") + F.col("v"))).alias("p1"))
    m = (F.col("p0") + F.col("p1")) / 2
    term = (0.5 * F.col("p0") * F.log(F.col("p0") / m)
            + 0.5 * F.col("p1") * F.log(F.col("p1") / m))
    jsd = p.agg(F.sum(term).alias("j")).collect()[0]["j"]
    assert abs(jsd) < 1e-12


def test_bpe_pair_counts_matches_python(spark, sf_dir):
    """First BPE merge step recomputed with collections.Counter."""
    import collections

    import pandas as pd

    got = specs()["text_bpe_pair_counts"].fn(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = collections.Counter()
    vocab = collections.Counter()
    for t in docs.text:
        for w in t.split(" "):
            if len(w) >= 2:
                vocab[w] += 1
    for w, freq in vocab.items():
        for i in range(len(w) - 1):
            cnt[w[i : i + 2]] += freq
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["pair"], r["n"]) for r in sorted(got, key=lambda r: r["rk"])] == want


def test_audio_vad_matches_python(spark, sf_dir):
    """VAD segments recomputed from the clip generation formulas."""
    import math

    got = {r["doc_id"]: r for r in specs()["multimodal_audio_vad"].fn(spark, sf_dir).collect()}
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for did in list(docs.doc_id[:50]):
        did = int(did)
        n = 800 + (did % 7) * 160
        smp = [((did * 131 + i * 17) % 2003) - 1001 for i in range(n)]
        vf = []
        for f in range(n // 80):
            seg = smp[f * 80 : (f + 1) * 80]
            vf.append(1 if math.sqrt(sum(x * x for x in seg) / 80) > 578.0 else 0)
        segs = sum(1 for f in range(len(vf)) if vf[f] and (f == 0 or not vf[f - 1]))
        r = got[did]
        assert (r["n_frames"], r["n_voiced"], r["n_segments"], r["voiced_ms"]) == (
            len(vf), sum(vf), segs, sum(vf) * 10,
        )


def test_perplexity_buckets_are_balanced_terciles(spark, sf_dir):
    """NTILE(3) must split scored docs into thirds (±1) and bucket
    order must follow the score order: every head score >= every tail
    score."""
    rows = specs()["text_perplexity_buckets"].fn(spark, sf_dir).collect()
    import collections

    by = collections.defaultdict(list)
    for r in rows:
        by[r["bucket"]].append(r["avg_logprob"])
    sizes = sorted(len(v) for v in by.values())
    assert sizes[-1] - sizes[0] <= 1 and set(by) == {"head", "middle", "tail"}
    assert min(by["head"]) >= max(by["tail"])


def _bpe_python_replica(texts, steps=3):
    """Pure-Python replica of text_bpe_train: vocab-grain pair counts,
    argmax merge (count desc, pair asc), greedy left-to-right merge
    application — the list-based equivalent of the delimited-string
    replace both engines run."""
    import collections
    import re

    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if len(w) >= 2 and re.fullmatch(r"[a-z]+", w):
                vocab[w] += 1
    seqs = {w: [c for c in w] for w in vocab}
    merges = []
    for step in (1, 2, 3)[:steps]:
        cnt = collections.Counter()
        for w, freq in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                cnt[f"<{s[i]}> <{s[i + 1]}>"] += freq
        pair, n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        x, y = pair[1:-1].split("> <")
        merges.append((step, pair, n))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_python(spark, sf_dir):
    """Three iterated BPE merges recomputed with a pure-Python trainer."""
    import pandas as pd

    got = sorted(
        [(r["step"], r["merge_pair"], r["n"]) for r in
         specs()["text_bpe_train"].fn(spark, sf_dir).collect()]
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert got == _bpe_python_replica(list(docs.text))


def test_pipeline_rag_matches_python(spark, sf_dir):
    """Chunk → hash-projection embed → bucket → top-2 retrieval
    replicated end-to-end in pure Python (md5 is engine-portable)."""
    import hashlib
    import math

    import pandas as pd

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    chunks = []  # (chunk_id, doc_id, text, dims, bucket, nrm)
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        n = len(toks)
        n_chunks = math.ceil(max(n - 50, 0) / 40.0)
        for i in range(n_chunks + 1):
            ct = toks[i * 40 : i * 40 + 50]
            if not ct:
                continue
            dims = [0] * 8
            for t in ct:
                h = h60(t)
                for j in range(8):
                    dims[j] += ((h >> j) & 1) * 2 - 1
            nrm = math.sqrt(sum(d * d for d in dims))
            bucket = sum((1 << j) for j in range(8) if dims[j] > 0)
            if nrm > 0:
                chunks.append((int(did) * 1000000 + i, int(did), " ".join(ct), dims, bucket, nrm))
    want = {}
    for qid, qdid, _qt, qd, qb, qn in chunks:
        if qdid >= 3:
            continue
        cands = []
        for nid, ndid, nt, nd, nb, nn in chunks:
            if ndid < 3 or nb != qb:
                continue
            cos = sum(a * b for a, b in zip(qd, nd)) / (qn * nn)
            cands.append((-cos, nid, nt))
        cands.sort()
        if cands:
            top = cands[:2]
            want[qid] = (len(top), round(-top[0][0], 6), " | ".join(t for _, _, t in top))
    rows = specs()["pipeline_rag"].fn(spark, sf_dir).collect()
    got = {r["q_id"]: (r["n_ctx"], round(r["best_cosine"], 6), r["context"]) for r in rows}
    assert got == want


def test_quality_train_recovers_literal_model(spark, sf_dir):
    """MLlib LR trained on the literal model's labels must agree with
    it almost everywhere (same features generated the labels)."""
    rows = specs()["text_quality_train"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    d = {(r["label"], r["prediction"]): r["n"] for r in rows}
    tot = sum(d.values())
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert tot == len(docs)
    agree = d.get((0, 0), 0) + d.get((1, 1), 0)
    assert agree / tot >= 0.93


def test_embedding_pca_power_matches_numpy(spark, sf_dir):
    """Replicate the two unrolled power iterations (v0 = 1/8, sign
    canonicalized on the max-|loading| dim) with dense numpy and check
    the distributed implicit-matvec result matches; the Rayleigh
    eigenvalue must also dominate a random direction's quotient."""
    import pandas as pd

    rows = specs()["embedding_pca_power"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    got_v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    got_lam = rows[0]["eigenvalue"]

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    v = np.full(64, 0.125)
    for _ in range(2):
        u = X.T @ (X @ v)
        v = u / np.linalg.norm(u)
    im = np.lexsort((np.arange(64), -np.abs(v)))[0]
    if v[im] < 0:
        v = -v
    lam = float(((X @ v) ** 2).sum()) / len(X)
    assert np.allclose(got_v, np.round(v, 6), atol=2e-6)
    assert got_lam == pytest.approx(lam, abs=1e-4)
    rng = np.random.default_rng(0)
    r = rng.normal(size=64)
    r /= np.linalg.norm(r)
    assert lam >= ((X @ r) ** 2).sum() / len(X)


def test_text_kneser_ney_matches_python(spark, sf_dir):
    """Recompute interpolated KN bigram probabilities with pure-Python
    counts and verify the top-20 cut (rounded-prob order, (w1,w2)
    tiebreak)."""
    import collections
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bigc = collections.Counter()
    for t in docs["text"]:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            bigc[(a, b)] += 1
    c1 = collections.Counter()
    n1f = collections.Counter()
    n1r = collections.Counter()
    for (a, b), c in bigc.items():
        c1[a] += c
        n1f[a] += 1
        n1r[b] += 1
    nt = float(len(bigc))
    want = []
    for (a, b), c in bigc.items():
        p = max(c - 0.75, 0.0) / c1[a] + ((0.75 * n1f[a]) / c1[a]) * (n1r[b] / nt)
        want.append((round(p, 6), a, b, c))
    want.sort(key=lambda t: (-t[0], t[1], t[2]))
    rows = specs()["text_kneser_ney"].fn(spark, sf_dir).collect()
    got = [(r["p_kn"], r["w1"], r["w2"], r["cb"]) for r in rows]
    assert got == [(p, a, b, c) for p, a, b, c in want[:20]]


def test_text_compression_ratio_is_exact_zlib(spark, sf_dir):
    """This key is rows-only (zlib is not SQL-expressible) so THIS test
    is its oracle: byte counts and ratio must equal direct zlib calls
    row-for-row, and the decile column must be a valid NTILE(10) over
    (ratio, doc_id) order."""
    import collections
    import zlib
    import pandas as pd

    rows = specs()["text_compression_ratio"].fn(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")
    assert len(rows) == len(docs)
    for r in rows:
        raw = docs.loc[r["doc_id"], "text"].encode("utf-8")
        z = len(zlib.compress(raw, 6))
        assert r["n_bytes"] == len(raw)
        assert r["z_bytes"] == z
        assert r["ratio"] == round(z / len(raw), 4)
    ordered = sorted(rows, key=lambda r: (r["ratio"], r["doc_id"]))
    tiles = [r["decile"] for r in ordered]
    assert tiles == sorted(tiles)  # non-decreasing along the sort order
    sizes = collections.Counter(tiles)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_multimodal_audio_spectrogram_matches_numpy(spark, sf_dir):
    """Recompute the 3-bin DFT log energies from the closed-form
    sample generator with numpy and compare every (clip, bin) row."""
    import pandas as pd

    rows = specs()["multimodal_audio_spectrogram"].fn(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    dids = sorted(int(d) for d in docs["doc_id"] if d % 10 == 0)
    want = {}
    for did in dids:
        n = 800 + (did % 7) * 160
        v = np.array([((did * 131 + i * 17) % 2003) - 1001 for i in range(n)],
                     dtype=np.float64)
        i = np.arange(n, dtype=np.float64)
        for k in (1, 2, 3):
            ang = ((2 * np.pi * k) * i) / n
            re = float((v * np.cos(ang)).sum())
            im = float((v * np.sin(ang)).sum())
            want[(did, k)] = round(float(np.log10(re * re + im * im + 1.0)), 4)
    got = {(r["doc_id"], r["k"]): r["log_energy"] for r in rows}
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-4)


def test_sim_ann_incremental_delta_files_and_participation(spark, sf_dir):
    """The delta append must (a) leave base bucket files untouched,
    (b) surface delta rows (vec_id % 10 == 0) as probe neighbors, and
    (c) produce exactly the full-rebuild answer (the DuckDB gate pins
    the values; here we pin the INGEST mechanICS the gate can't see)."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx_path = os.path.join(repo_root, ".index", f"ann_inc_{tag}")

    # Snapshot the base generation BETWEEN the two writes via the build
    # hook (ADVICE r7: capturing mtimes after both writes made the
    # untouched-base assertion vacuous).
    base_snapshot = {}

    def snap(path):
        base_snapshot.update(
            {
                f: (os.path.getsize(os.path.join(path, f)),
                    os.path.getmtime(os.path.join(path, f)))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            }
        )

    import flink_kmeans_spark.plans.llm as llm_mod
    from flink_kmeans_spark.functions.vectors import l2norm
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    cell = sum(
        (F.when(v.getItem(i) > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        for i in range(8)
    )
    indexed = e.select(
        "vec_id", "embedding", cell.alias("bucket"), l2norm(v).alias("nrm")
    )
    llm_mod._ann_inc_build(spark, indexed, f"ann_inc_{tag}", idx_path,
                           on_base_written=snap)
    assert base_snapshot, "base generation wrote no parquet files"
    after = {
        f: (os.path.getsize(os.path.join(idx_path, f)),
            os.path.getmtime(os.path.join(idx_path, f)))
        for f in os.listdir(idx_path)
        if f.endswith(".parquet")
    }
    # (a) every base file survives the append byte-for-byte (size+mtime)
    for f, sig in base_snapshot.items():
        assert f in after and after[f] == sig, f"base file {f} was rewritten"
    # and the append added NEW per-bucket files on top
    assert len(after) > len(base_snapshot)

    rows = specs()["sim_ann_incremental"].fn(spark, sf_dir).collect()
    files = sorted(
        f for f in os.listdir(idx_path) if f.endswith(".parquet")
    )
    # overwrite wrote one generation, append a second: more files than
    # buckets touched by one write alone, and every file parses the
    # _NNNNN.cNNN bucket naming Spark uses for bucketed tables.
    assert len(files) > 16 / 2  # at least some buckets have 2 generations
    # rows: per-query top-3 over the merged index
    assert all(r["rk"] in (1, 2, 3) for r in rows)
    phases = {r["phase"] for r in rows}
    assert phases <= {"base", "delta"}
    assert "delta" in phases, "delta rows never surfaced as neighbors"
    # re-running the key rebuilds from scratch (its documented contract)
    rows2 = specs()["sim_ann_incremental"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pipeline_rag_rerank_two_stage_semantics(spark, sf_dir):
    """Stage-2 exact top-2 must equal a pure-Python two-stage replica
    (sketch top-20 → exact tf-cosine top-2), proving the stage-1 cut
    and the exact kernel both match; and every query gets n_ctx == 2
    when ≥2 same-bucket candidates exist."""
    import hashlib
    import math

    import pandas as pd

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    chunks = []
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        n = len(toks)
        n_chunks = math.ceil(max(n - 50, 0) / 40.0)
        for i in range(n_chunks + 1):
            ct = toks[i * 40 : i * 40 + 50]
            if not ct:
                continue
            dims = [0] * 8
            for t in ct:
                h = h60(t)
                for j in range(8):
                    dims[j] += ((h >> j) & 1) * 2 - 1
            nrm = math.sqrt(sum(d * d for d in dims))
            bucket = sum((1 << j) for j in range(8) if dims[j] > 0)
            tf = {}
            for t in ct:
                tf[t] = tf.get(t, 0) + 1
            tf2 = sum(c * c for c in tf.values())
            if nrm > 0:
                chunks.append(
                    (int(did) * 1000000 + i, int(did), " ".join(ct),
                     dims, bucket, nrm, tf, tf2)
                )
    want = {}
    for qid, qdid, _qt, qd, qb, qn, qtf, qn2 in chunks:
        if qdid >= 3:
            continue
        s1 = []
        for nid, ndid, nt, nd, nb, nn, ntf, nn2 in chunks:
            if ndid < 3 or nb != qb:
                continue
            sk = sum(a * b for a, b in zip(qd, nd)) / (qn * nn)
            s1.append((-sk, nid, nt, ntf, nn2))
        s1.sort(key=lambda r: (r[0], r[1]))
        cand = s1[:20]
        s2 = []
        for _sk, nid, nt, ntf, nn2 in cand:
            dot = sum(c * ntf.get(t, 0) for t, c in qtf.items())
            ex = dot / math.sqrt(float(qn2) * nn2)
            s2.append((-ex, nid, nt))
        s2.sort(key=lambda r: (r[0], r[1]))
        top = s2[:2]
        if top:
            want[qid] = (
                len(top),
                round(-top[0][0], 6),
                " | ".join(t for _, _, t in top),
            )
    rows = specs()["pipeline_rag_rerank"].fn(spark, sf_dir).collect()
    got = {
        r["q_id"]: (r["n_ctx"], round(r["best_exact"], 6), r["context"])
        for r in rows
    }
    assert got == want


def test_dedup_minhash_incremental_mechanics(spark, sf_dir):
    """(a) the delta append leaves base bucket files untouched
    (snapshot BETWEEN the writes via the build hook), (b) the result
    equals dedup_minhash's full-recompute pairs on the same corpus,
    (c) delta docs (doc_id % 10 == 0) actually participate in pairs —
    so the incremental ≡ full equality is not vacuous."""
    full = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in specs()["dedup_minhash"].fn(spark, sf_dir).collect()
    }
    inc_rows = specs()["dedup_minhash_incremental"].fn(spark, sf_dir).collect()
    inc = {(r["id_a"], r["id_b"]): r["jaccard_est"] for r in inc_rows}
    assert inc == full
    assert any(a % 10 == 0 or b % 10 == 0 for a, b in inc), (
        "no delta doc ever appeared in a pair — equality is vacuous"
    )

    # base-generation immutability via the build hook
    import hashlib
    import os

    import flink_kmeans_spark.plans.llm as llm_mod
    from pyspark.sql import functions as F

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx_path = os.path.join(repo_root, ".index", f"mh_inc_{tag}")
    snapshot = {}

    def walk_sig(path):
        return {
            os.path.join(dp, f): (os.path.getsize(os.path.join(dp, f)),
                                  os.path.getmtime(os.path.join(dp, f)))
            for dp, _, names in os.walk(path)
            for f in names
            if f.endswith(".parquet")
        }

    def snap(path):
        snapshot.update(walk_sig(path))

    from flink_kmeans_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), num_hashes=32
    )

    def groups_of(part):
        return part.groupBy("minhash").agg(
            F.array_sort(F.collect_list("doc_id")).alias("members")
        )

    def banded_of(groups, gen):
        width = 4
        return groups.select(
            F.col("members").getItem(0).alias("gid"),
            "minhash",
            "members",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda b: F.concat(
                        b.cast("string"),
                        F.lit("|"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("minhash"), b * width + 1, width),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        ),
                    ),
                )
            ).alias("bkey"),
            F.lit(gen).alias("gen"),
        )

    base_g = groups_of(sigs.filter(F.col("doc_id") % 10 != 0))
    delta_g = groups_of(sigs.filter(F.col("doc_id") % 10 == 0))
    llm_mod._mh_inc_build(
        spark,
        banded_of(base_g, "base"),
        banded_of(delta_g, "delta"),
        f"mh_inc_{tag}",
        idx_path,
        on_base_written=snap,
    )
    assert snapshot, "base generation wrote no parquet files"
    after = walk_sig(idx_path)
    for f, sig in snapshot.items():
        assert f in after and after[f] == sig, f"base file {f} was rewritten"
    assert len(after) > len(snapshot), "delta appended no new files"


def test_streaming_ann_probe_micro_batches(spark, sf_dir):
    """The stream must drain in TWO micro-batches (one per query file)
    each staging its own batch=N dir, and the merged result must equal
    the batch probe semantics: top-3 per query, per-batch bucket
    pruning asserted inside the callable itself."""
    import glob
    import os

    df = specs()["streaming_ann_probe"].fn(spark, sf_dir)
    rows = df.collect()
    # the staged sink: one batch dir per micro-batch
    src = df.inputFiles()[0].removeprefix("file://")
    result_root = src[: src.index("/batch=")]
    batch_dirs = sorted(
        os.path.basename(p) for p in glob.glob(f"{result_root}/batch=*")
    )
    assert batch_dirs == ["batch=0", "batch=1"]
    assert all(r["rk"] in (1, 2, 3) for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["rk"])
    # ten queries arrive across the two files; a query whose cell holds
    # no OTHER vector legitimately yields zero neighbors, so require
    # most — not all — to surface, with dense ranks 1..n each
    assert len(by_q) >= 8
    qids = spark.read.parquet(f"{sf_dir}/embeddings.parquet").orderBy(
        "vec_id").limit(10).select("vec_id")
    first10 = {r["vec_id"] for r in qids.collect()}
    assert set(by_q) <= first10
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_dedup_substring_span_mechanics(spark, tmp_path):
    """Span boundaries pinned on a synthesized corpus: docs 1 and 2
    share a 12-token run (marked 8-gram starts merge into ONE maximal
    span covering exactly the shared tokens), doc 3 shares nothing and
    must emit no span; within-doc-only repeats must NOT mark."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"s{i}" for i in range(12))
    texts = [
        "a1 a2 a3 " + shared + " z1 z2",
        "b1 " + shared + " y1 y2 y3",
        # 30 unique tokens, then a WITHIN-doc repeat of its own prefix:
        # cross-doc predicate must ignore it
        " ".join(f"u{i}" for i in range(30))
        + " "
        + " ".join(f"u{i}" for i in range(10)),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": texts,
                "lang": ["en"] * 3,
                "source": ["t"] * 3,
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = specs()["dedup_substring_span"].fn(spark, str(tmp_path)).collect()
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in rows
    }
    # doc 1: tokens 4..15 are the shared run → 8-gram starts 4..8 →
    # one span [4, 15] (12 tokens); doc 2: starts 2..6 → [2, 13]
    assert got == {(1, 4, 15, 12), (2, 2, 13, 12)}


def test_streaming_minhash_dedup_ledger(spark, sf_dir):
    """(a) stream-ledger answer ≡ batch signature-grain recompute,
    (b) the drain really ran MULTIPLE micro-batches (3 shard files,
    maxFilesPerTrigger=1), so the cross-batch min/sum merge is
    exercised, not vacuous."""
    import glob
    import os

    rows = specs()["streaming_minhash_dedup"].fn(spark, sf_dir).collect()
    sigs = DD.minhash_signatures(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    batch = (
        sigs.groupBy("minhash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
        .collect()
    )
    assert {(r["doc_id"], r["n_members"]) for r in rows} == {
        (r["doc_id"], r["n_members"]) for r in batch
    }
    roots = sorted(
        glob.glob(os.path.join(SCRATCH_DIR, "mh_stream_*")), key=os.path.getmtime
    )
    assert roots, "stream left no scratch root"
    batches = [
        b
        for b in os.listdir(os.path.join(roots[-1], "ledger"))
        if b.startswith("batch=")
    ]
    assert len(batches) == 3


def test_dedup_substring_cut_mechanics(spark, tmp_path):
    """Cut semantics pinned on a synthesized corpus: the shared
    12-token run is excised from BOTH docs with surrounding tokens
    reassembled in order; within-doc-only repeats are untouched; a
    doc shorter than the 8-gram width passes through; a pair of
    fully-duplicated docs both collapse to empty clean_text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"s{i}" for i in range(12))
    full_dup = " ".join(f"d{i}" for i in range(10))
    texts = [
        "a1 a2 a3 " + shared + " z1 z2",
        "b1 " + shared + " y1 y2 y3",
        # within-doc repeat only: cross-doc predicate must ignore it
        " ".join(f"u{i}" for i in range(30))
        + " "
        + " ".join(f"u{i}" for i in range(10)),
        "short doc under gram width",
        full_dup,
        full_dup,
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": texts,
                "lang": ["en"] * 6,
                "source": ["t"] * 6,
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = specs()["dedup_substring_cut"].fn(spark, str(tmp_path)).collect()
    got = {r["doc_id"]: r for r in rows}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1]["clean_text"] == "a1 a2 a3 z1 z2"
    assert (got[1]["kept_tokens"], got[1]["cut_tokens"]) == (5, 12)
    assert got[2]["clean_text"] == "b1 y1 y2 y3"
    assert (got[2]["kept_tokens"], got[2]["cut_tokens"]) == (4, 12)
    assert got[3]["clean_text"] == texts[2] and got[3]["cut_tokens"] == 0
    assert got[4]["clean_text"] == texts[3] and got[4]["cut_tokens"] == 0
    for d in (5, 6):
        assert got[d]["clean_text"] == "" and got[d]["kept_tokens"] == 0
        assert got[d]["cut_tokens"] == 10


def test_dedup_semantic_kmeans_vs_numpy(spark, sf_dir, emb):
    """Independent oracle: brute-force numpy within-cluster cosine over
    the engine's OWN assignments must reproduce the pair set exactly —
    proving the exact-collapse + map-side member expansion loses no
    pair and fabricates none, and every pair stays within a cluster."""
    asg = {
        r["vec_id"]: r["cid"]
        for r in specs()["kmeans_predict"].fn(spark, sf_dir).collect()
    }
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    by_cid = {}
    for vid, cid in asg.items():
        by_cid.setdefault(cid, []).append(vid)
    want = set()
    for cid, ids in by_cid.items():
        ids.sort()
        for i, a in enumerate(ids):
            va, na = vecs[a], np.linalg.norm(vecs[a])
            for b in ids[i + 1 :]:
                cos = float(va @ vecs[b]) / (na * float(np.linalg.norm(vecs[b])))
                if cos >= 0.4:
                    want.add((a, b, cid, round(cos, 6)))
    rows = specs()["dedup_semantic_kmeans"].fn(spark, sf_dir).collect()
    got = {
        (r["id_a"], r["id_b"], r["cid"], round(r["cosine"], 6)) for r in rows
    }
    assert len(rows) == len(got), "duplicate pairs emitted"
    assert got == want


def test_dsir_selects_target_like_docs(spark, tmp_path):
    """DSIR's point: importance resampling shifts the selected set
    toward the target distribution. On a corpus with a REAL vocabulary
    split (en docs speak {e*}, others speak {z*}; the gate corpus's
    langs all share one 31-token vocab, so the signal there drowns in
    the Gumbel noise by design) the selected set must be almost
    entirely en; ranks must be 1..k with non-increasing gumbel keys."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 300
    texts, langs = [], []
    for i in range(n):
        if i % 3 == 0:  # 100 en docs over the e-vocab
            texts.append(" ".join(f"e{(i + j) % 12}" for j in range(40)))
            langs.append("en")
        else:  # 200 non-en docs over a disjoint z-vocab
            texts.append(" ".join(f"z{(i + j) % 12}" for j in range(40)))
            langs.append("zh" if i % 3 == 1 else "de")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(1, n + 1)),
                "text": texts,
                "lang": langs,
                "source": ["t"] * n,
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = (
        specs()["data_dsir_select"]
        .fn(spark, str(tmp_path))
        .orderBy("rank")
        .collect()
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [r["gumbel_key"] for r in rows]
    assert all(a >= b for a, b in zip(keys, keys[1:]))
    lang = dict(zip(range(1, n + 1), langs))
    sel = sum(1 for r in rows if lang[r["doc_id"]] == "en") / len(rows)
    # base rate is 1/3; logw gap between vocabularies is >> Gumbel noise
    assert sel >= 0.9, f"selected en share {sel} — importance shift failed"


def test_sample_reservoir_group_exact_k_and_deterministic(spark, sf_dir, docs):
    """Exactly k per stratum (or the whole stratum when smaller), and
    two runs return identical rows — the fixed-count, reproducible
    guarantee that distinguishes this from Bernoulli threshold
    sampling (sample_hash_stratified)."""
    import collections

    fn = specs()["sample_reservoir_group"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = collections.Counter(lang for lang, _, _ in a)
    assert got == {lg: min(5, n) for lg, n in sizes.items()}


def test_sim_hard_negatives_band_vs_numpy(spark, sf_dir, emb):
    """Numpy brute force: per anchor, the in-band [0.3, 0.9) top-3 by
    cosine must match exactly — and no returned negative may be a
    near-duplicate (>= 0.9) or an uninformative pair (< 0.3)."""
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    ids = sorted(vecs)
    anchors = ids[:10]
    want = set()
    for a in anchors:
        va, na = vecs[a], np.linalg.norm(vecs[a])
        cands = []
        for b in ids:
            if b == a:
                continue
            cos = float(va @ vecs[b]) / (na * float(np.linalg.norm(vecs[b])))
            if 0.3 <= cos < 0.9:
                cands.append((-cos, b))
        for rk, (negc, b) in enumerate(sorted(cands)[:3], start=1):
            want.add((a, b, rk, round(-negc, 6)))
    rows = specs()["sim_hard_negatives"].fn(spark, sf_dir).collect()
    got = {
        (r["q_id"], r["n_id"], r["rk"], round(r["cosine"], 6)) for r in rows
    }
    assert got == want
    assert all(0.3 <= r["cosine"] < 0.9 for r in rows)


def test_phash_dedup_banding_is_lossless(spark, sf_dir, docs):
    """Pigeonhole completeness: brute-force hamming over the engine's
    OWN dHash table must equal the banded key's pair set exactly at
    the ≤3 cut (band logic verified against all-pairs, independent of
    the SQL oracle's pixel formulas) — and byte-identical images
    (doc_id ≡ doc_id' mod 36608 shares dims AND pixels) must surface
    as hamming-0 pairs."""
    hashes = {
        r["doc_id"]: r["dhash"]
        for r in MM.dhash_image_media(
            MM.to_image_table(docs), hash_w=8, hash_h=8
        )
        .select("doc_id", "dhash")
        .collect()
    }
    ids = sorted(hashes)
    want = set()
    for i, a in enumerate(ids):
        ha = hashes[a]
        for b in ids[i + 1 :]:
            d = sum(x != y for x, y in zip(ha, hashes[b]))
            if d <= 3:
                want.add((a, b, d))
    rows = specs()["multimodal_phash_dedup"].fn(spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in rows}
    assert len(rows) == len(got), "duplicate pairs emitted"
    assert got == want
    # synthesize a true identical-image pair: 36608 apart
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory(dir=SCRATCH_DIR) as td:
        pq.write_table(
            pa.table(
                {
                    "doc_id": [7, 36615, 50],
                    "text": ["a", "b", "c"],
                    "lang": ["en"] * 3,
                    "source": ["t"] * 3,
                    "n_chars": [1, 1, 1],
                }
            ),
            os.path.join(td, "documents.parquet"),
        )
        pairs = specs()["multimodal_phash_dedup"].fn(spark, td).collect()
    assert any(
        (r["id_a"], r["id_b"], r["hamming"]) == (7, 36615, 0) for r in pairs
    )


def test_data_sequence_pack_invariants(spark, sf_dir):
    """Packing invariants: every slot index is inside its class's
    capacity, no sequence exceeds the 256-token budget, sequence ids
    are dense per (shard, class), and measured packing efficiency on
    full sequences clears the ≥0.45 structural bound."""
    from flink_kmeans_spark.plans.llm import _PACK_S

    rows = specs()["data_sequence_pack"].fn(spark, sf_dir).collect()
    assert rows
    by_seq = {}
    for r in rows:
        cap = _PACK_S // r["cap_bucket"]
        assert 0 <= r["pos_in_seq"] < cap
        assert r["tokens_used"] == min(r["n_tokens"], _PACK_S)
        assert r["tokens_used"] <= r["cap_bucket"]
        by_seq.setdefault(
            (r["shard"], r["cap_bucket"], r["seq_id"]), []
        ).append(r)
    full_used = 0
    n_full = 0
    for (_, bucket, _), members in by_seq.items():
        used = sum(r["tokens_used"] for r in members)
        assert used <= _PACK_S, "sequence exceeds token budget"
        pos = sorted(r["pos_in_seq"] for r in members)
        assert pos == list(range(len(pos))), "slot assignment not dense"
        if len(members) == _PACK_S // bucket:  # full sequence
            n_full += 1
            full_used += used
    # every non-bottom class fills >1/2 of each slot; the gate corpus
    # must clear 45% on its full sequences
    assert n_full > 0
    assert full_used / (n_full * _PACK_S) >= 0.45
    # per-(shard, class) seq ids are contiguous from 0
    seqs_by_class = {}
    for (shard, bucket, seq_id) in by_seq:
        seqs_by_class.setdefault((shard, bucket), set()).add(seq_id)
    for ids in seqs_by_class.values():
        assert ids == set(range(len(ids)))


def test_dedup_minhash_compact_mechanics(spark, sf_dir):
    """Compaction is bucket-bounded and lossless: untouched base
    bucket files are carried into the compacted table BYTE-identical
    (no rewrite), Spark-written file count ≤ touched buckets (the
    in-operator assert), and the compacted pairs equal the
    full-recompute dedup_minhash answer."""
    import glob
    import hashlib
    import os

    rows = specs()["dedup_minhash_compact"].fn(spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"], round(r["jaccard_est"], 6)) for r in rows}
    want_rows = specs()["dedup_minhash"].fn(spark, sf_dir).collect()
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard_est"], 6)) for r in want_rows
    }
    assert got == want
    idx_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".index"
    )
    src = max(
        glob.glob(os.path.join(idx_root, "mh_cmpsrc_*")), key=os.path.getmtime
    )
    cmp_dir = max(
        glob.glob(os.path.join(idx_root, "mh_cmp_*")), key=os.path.getmtime
    )

    def md5_of(path):
        return hashlib.md5(open(path, "rb").read()).hexdigest()

    cmp_files = {
        f: md5_of(os.path.join(cmp_dir, f))
        for f in os.listdir(cmp_dir)
        if f.endswith(".parquet")
    }
    base_dir = os.path.join(src, "gen=base")
    carried = 0
    for f in os.listdir(base_dir):
        if not f.endswith(".parquet"):
            continue
        if f in cmp_files:  # carried file keeps its basename
            assert cmp_files[f] == md5_of(os.path.join(base_dir, f)), (
                "carried base file was rewritten"
            )
            carried += 1
    assert carried > 0, (
        "no untouched base bucket file was carried — either every "
        "bucket was touched (fixture drift) or the carry logic broke"
    )


def test_dedup_bloom_prefilter_invariants(spark, sf_dir, docs):
    """Bloom has NO false negatives (exact ⊆ bloom per doc), counts are
    consistent, and exact_hits per doc equals an independently computed
    pandas 5-gram membership count across the %10 split."""
    rows = specs()["dedup_bloom_prefilter"].fn(spark, sf_dir).collect()
    assert rows, "batch side empty"
    for r in rows:
        assert 0 <= r["exact_hits"] <= r["bloom_hits"] <= r["n_grams"]
        assert r["false_pos"] == r["bloom_hits"] - r["exact_hits"]

    pdf = docs.select("doc_id", "text").toPandas()

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    base = set()
    for _, r in pdf[pdf.doc_id % 10 != 7].iterrows():
        base |= grams(r.text)
    want = {
        int(r.doc_id): (
            len(grams(r.text)),
            sum(1 for g in grams(r.text) if g in base),
        )
        for _, r in pdf[pdf.doc_id % 10 == 7].iterrows()
        if grams(r.text)
    }
    got = {int(r["doc_id"]): (r["n_grams"], r["exact_hits"]) for r in rows}
    assert got == want


def test_data_temperature_mix_invariants(spark, sf_dir, docs):
    """Target shares sum to 1, flattening moves every share toward
    uniform (q between p and 1/L on each side), rates respect the cap,
    and 'selected' matches an independent pandas md5-coin replay."""
    import hashlib

    rows = specs()["data_temperature_mix"].fn(spark, sf_dir).collect()
    L = len(rows)
    assert abs(sum(r["target_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        lo, hi = sorted((r["share"], 1.0 / L))
        assert lo - 1e-6 <= r["target_share"] <= hi + 1e-6, (
            "temperature scaling must move shares toward uniform"
        )
        assert 0.0 <= r["rate"] <= 1.0
        assert 0 <= r["selected"] <= r["n_docs"]

    pdf = docs.select("doc_id", "lang").toPandas()
    n = pdf.groupby("lang").size()
    import math

    ssq = sum(math.sqrt(c) for c in n)
    total = int(n.sum())
    sel = {}
    for lang, cnt in n.items():
        rate = min(1.0, (math.sqrt(cnt) / ssq) * total / cnt)
        ids = pdf[pdf.lang == lang].doc_id
        coin = lambda i: (
            int(hashlib.md5(f"{i}#temp".encode()).hexdigest()[:15], 16)
            / float(1 << 60)
        )
        sel[lang] = sum(1 for i in ids if coin(int(i)) < rate)
    got = {r["lang"]: r["selected"] for r in rows}
    assert got == sel


def test_agg_dp_laplace_mechanism(spark, sf_dir, docs):
    """The noise is exactly the inverse-CDF Laplace draw from the md5
    uniform (replayed in numpy), is zero-mean-capable (sign varies with
    the hash), and the noisy count stays within the analytic tail bound
    |noise| ≤ (1/ε)·ln(1/δ) for δ = 1e-15."""
    import hashlib
    import math

    rows = specs()["agg_dp_laplace"].fn(spark, sf_dir).collect()
    counts = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    eps = 0.5
    for r in rows:
        u = (
            int(hashlib.md5(f"{r['lang']}#dp".encode()).hexdigest()[:15], 16)
            / float(1 << 60)
        )
        v = u - 0.5
        noise = -(1.0 / eps) * math.copysign(1.0, v) * math.log(
            max(1.0 - 2.0 * abs(v), 1e-15)
        )
        assert abs(r["noisy_count"] - round(counts[r["lang"]] + noise, 6)) < 1e-6
        assert abs(noise) <= (1.0 / eps) * math.log(1e15) + 1e-9
        assert r["epsilon"] == eps


# ----------------------------- r10: content-defined chunking dedup


def _py_cdc_chunks(text, w=16, d=64):
    """Pure-Python reference chunker mirroring the CDC contract."""
    import hashlib

    bounds = [
        p
        for p in range(w, len(text) + 1)
        if int(hashlib.md5(text[p - w : p].encode()).hexdigest()[:15], 16) % d
        == 0
    ]
    if not bounds or bounds[-1] != len(text):
        bounds.append(len(text))
    out, s = [], 0
    for p in bounds:
        out.append(text[s:p])
        s = p
    return out


def test_cdc_chunks_match_pure_python_chunker(spark, sf_dir, docs):
    """Spark chunk digests per doc == the reference chunker's, in
    order, for every document at smoke scale."""
    import hashlib

    from flink_kmeans_spark.plans.llm import cdc_chunks

    got = (
        cdc_chunks(docs.select("doc_id", "lang", "text"))
        .orderBy("doc_id", "ord")
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["digest"], r["clen"]))
    import pandas as pd

    texts = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    assert len(by_doc) == len(texts)
    for _, row in texts.iterrows():
        want = [
            (hashlib.md5(c.encode()).hexdigest(), len(c))
            for c in _py_cdc_chunks(row["text"])
        ]
        assert by_doc[int(row["doc_id"])] == want, row["doc_id"]


def test_cdc_chunks_shift_resistance(spark):
    """THE CDC property: prepending bytes to a document shifts every
    byte offset, yet all chunks after the first content boundary keep
    their digests — fixed-size blocking would lose every block."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps on the warm windowsill and the birds sing in the "
        "garden under a bright morning sun with dew on the grass "
        "and a gentle breeze moving through the old oak trees"
    ) * 3
    edited = "XYZ-PREFIX " + base
    a = _py_cdc_chunks(base)
    b = _py_cdc_chunks(edited)
    # identical suffix of the chunk streams (all content boundaries
    # after the edit neighborhood land on the same content)
    k = 0
    while k < min(len(a), len(b)) and a[-1 - k] == b[-1 - k]:
        k += 1
    assert k >= max(1, len(a) - 2), (len(a), len(b), k)
    # and the shared chunks cover the overwhelming majority of bytes
    shared = sum(len(c) for c in a[-k:])
    assert shared / len(base) > 0.8


def test_dedup_cdc_chunks_stats_consistent(spark, sf_dir):
    """Registered key's per-lang stats recomputed from the chunk grain
    independently (pandas groupby over the reference chunker)."""
    import hashlib

    import pandas as pd

    got = {
        r["lang"]: r
        for r in specs()["dedup_cdc_chunks"].fn(spark, sf_dir).collect()
    }
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")[["lang", "text"]]
    agg = {}
    for _, row in df.iterrows():
        cs = _py_cdc_chunks(row["text"])
        st = agg.setdefault(row["lang"], {"n": 0, "uniq": {}})
        st["n"] += len(cs)
        for c in cs:
            st["uniq"][hashlib.md5(c.encode()).hexdigest()] = len(c)
    assert set(got) == set(agg)
    for lang, st in agg.items():
        r = got[lang]
        assert r["n_chunks"] == st["n"]
        assert r["n_unique"] == len(st["uniq"])
        assert r["chars_unique"] == sum(st["uniq"].values())


def test_dedup_cdc_incremental_mechanics(spark, sf_dir):
    """(a) the ingest append leaves base index files untouched
    (snapshot between the writes via the build hook), (b) the per-lang
    accounting matches an independent pandas replay of the reference
    chunker, (c) the store after ingest holds exactly the full
    corpus's distinct chunk digests."""
    import hashlib
    import os

    import pandas as pd

    from flink_kmeans_spark.plans.llm import dedup_cdc_incremental

    snapshot = {}

    def walk_sig(path):
        return {
            os.path.join(dp, f): (
                os.path.getsize(os.path.join(dp, f)),
                os.path.getmtime(os.path.join(dp, f)),
            )
            for dp, _, names in os.walk(path)
            for f in names
            if f.endswith(".parquet")
        }

    state = {}

    def snap(path):
        state["idx_path"] = path
        snapshot.update(walk_sig(path))

    got = {
        r["lang"]: r
        for r in dedup_cdc_incremental(spark, sf_dir, on_base_built=snap).collect()
    }
    # (a) base files byte-untouched after the append
    after = walk_sig(state["idx_path"])
    for p, sig in snapshot.items():
        assert after.get(p) == sig, f"base index file rewritten: {p}"
    assert len(after) > len(snapshot), "append wrote no new files"

    # (b) pandas replay of the accounting
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "text"]
    ]
    base_digests, all_digests = set(), set()
    for _, row in df.iterrows():
        cs = [
            hashlib.md5(c.encode()).hexdigest()
            for c in _py_cdc_chunks(row["text"])
        ]
        all_digests.update(cs)
        if row["doc_id"] % 3 != 0:
            base_digests.update(cs)
    # second pass: known-ness is vs the COMPLETE base store, not
    # arrival order
    agg = {}
    for _, row in df.iterrows():
        if row["doc_id"] % 3 != 0:
            continue
        cs = [
            (hashlib.md5(c.encode()).hexdigest(), len(c))
            for c in _py_cdc_chunks(row["text"])
        ]
        st = agg.setdefault(
            row["lang"], {"n": 0, "known": 0, "chars": 0, "new": {}}
        )
        for d, ln in cs:
            st["n"] += 1
            st["chars"] += ln
            if d in base_digests:
                st["known"] += 1
            else:
                st["new"][d] = ln
    assert set(got) == set(agg)
    for lang, st in agg.items():
        r = got[lang]
        assert (r["n_chunks"], r["n_known"], r["chars_total"]) == (
            st["n"], st["known"], st["chars"]
        )
        assert r["n_new_unique"] == len(st["new"])
        assert r["chars_new"] == sum(st["new"].values())

    # (c) the store now holds exactly the corpus's distinct digests
    stored = set(
        pd.concat(
            [pd.read_parquet(p) for p in after], ignore_index=True
        )["digest"]
    )
    assert stored == all_digests


def test_sample_weighted_reservoir_replay_and_es_law(spark, sf_dir):
    """(a) exact numpy/hashlib replay of the deterministic A-Res
    selection; (b) the Efraimidis-Spirakis inclusion law — over many
    independent coins (salts), P(doc wins top-1) tracks w/sum(w) — on
    a small pure-Python replica, so the construction (not just the
    plumbing) is pinned."""
    import hashlib
    import math

    import pandas as pd

    from flink_kmeans_spark.plans.llm import _WRS_K, _WRS_TWO60

    got = [
        (r["doc_id"], r["lang"], r["weight"], r["wkey"])
        for r in specs()["sample_weighted_reservoir"].fn(spark, sf_dir).collect()
    ]
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "n_chars"]
    ]
    df = df[df.n_chars > 0]

    def coin(doc_id, salt="#wrs"):
        h = int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:15], 16)
        return (h + 0.5) / _WRS_TWO60

    rows = [
        (int(r.doc_id), r.lang, float(r.n_chars),
         math.log(coin(int(r.doc_id))) / float(r.n_chars))
        for r in df.itertuples()
    ]
    rows.sort(key=lambda t: (-t[3], t[0]))
    want = [(d, l, w, round(k, 10)) for d, l, w, k in rows[:_WRS_K]]
    assert got == want

    # (b) inclusion law on a tiny replica: 4 items, weights 1/2/3/4 —
    # the top-1 win rate over 4000 salts must track w/sum(w)
    weights = {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}
    wins = {i: 0 for i in weights}
    trials = 4000
    for t in range(trials):
        best, best_k = None, -float("inf")
        for i, w in weights.items():
            k = math.log(coin(i, salt=f"#t{t}")) / w
            if k > best_k:
                best, best_k = i, k
        wins[best] += 1
    tot_w = sum(weights.values())
    for i, w in weights.items():
        assert abs(wins[i] / trials - w / tot_w) < 0.03, (i, wins)
