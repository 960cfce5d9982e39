"""Curation-operator property tests: MinHash/SimHash/ANN/fingerprints/stub.

These back the rows-only harness entries (dedup_minhash_lsh, dedup_simhash,
sim_ann_lsh, text_fingerprint, mm_decode_features) with quality checks the
SQL oracle can't express.
"""

import random

import pytest
from pyspark.sql import functions as F

from sparkdu.dedup import (
    ann_brute_topk,
    ann_lsh_topk,
    hamming64,
    minhash_lsh_pairs,
    rolling_fp_py,
    rolling_fingerprints,
    simhash_fingerprints,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu".split()


@pytest.fixture(scope="module")
def docs_df(spark):
    rng = random.Random(7)
    rows = []
    for i in range(120):
        rows.append((i, " ".join(rng.choice(WORDS) for _ in range(60))))
    # 15 near-dup pairs: copy with one word changed (high Jaccard)
    for j in range(15):
        base = rows[j][1].split(" ")
        base[rng.randrange(len(base))] = rng.choice(WORDS)
        rows.append((1000 + j, " ".join(base)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _jaccard(a: str, b: str, k: int = 5) -> float:
    sa = {a.lower()[i : i + k] for i in range(len(a) - k + 1)}
    sb = {b.lower()[i : i + k] for i in range(len(b) - k + 1)}
    return len(sa & sb) / len(sa | sb)


def test_minhash_lsh_recall(spark, docs_df):
    texts = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    truth = {
        (j, 1000 + j)
        for j in range(15)
        if _jaccard(texts[j], texts[1000 + j]) >= 0.6
    }
    pairs = {
        (r["a_id"], r["b_id"]) for r in minhash_lsh_pairs(docs_df).collect()
    }
    hits = truth & pairs
    assert len(hits) / max(len(truth), 1) >= 0.8, (len(hits), len(truth))
    # precision: candidates should mostly be genuinely similar
    good = sum(1 for a, b in pairs if _jaccard(texts[a], texts[b]) >= 0.3)
    assert good / max(len(pairs), 1) >= 0.8


def test_quantize_dequantize_fidelity(spark):
    import math

    from sparkdu.dedup import dequantize, quantize_int8

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(50)]
    rows.append((999, [0.0] * 32))  # all-zero guard
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = quantize_int8(emb)
    # int8 range respected
    mx = q.select(F.array_max(F.transform("qvec", lambda v: F.abs(v))).alias("m"))
    assert all(r["m"] <= 127 for r in mx.collect())
    deq = {r["vec_id"]: r["embedding"] for r in dequantize(q).collect()}
    orig = dict(rows)
    for vid, o in orig.items():
        d = deq[vid]
        dot = sum(a * b for a, b in zip(o, d))
        no = math.sqrt(sum(a * a for a in o))
        nd = math.sqrt(sum(a * a for a in d))
        if no == 0:
            assert nd == 0
            continue
        assert dot / (no * nd) > 0.995, vid  # cosine fidelity after 4x shrink


def test_ann_ivf_recall_vs_brute(spark):
    import math

    from sparkdu.dedup import ann_ivf_topk, ivf_fit

    rng = random.Random(23)
    rows = []
    for i in range(300):
        v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    cents = ivf_fit(emb, dim=16, k=8, iters=2)
    assert len(cents) == 8 and all(len(c) == 16 for c in cents)
    brute = ann_brute_topk(emb, n_queries=3, k=10).collect()
    ivf = ann_ivf_topk(emb, cents, n_queries=3, k=10, nprobe=3).collect()
    bmap = {(r["q_id"], r["vec_id"]): r["cos"] for r in brute}
    imap = {(r["q_id"], r["vec_id"]): r["cos"] for r in ivf}
    # exact scoring inside probed cells
    for key, v in imap.items():
        if key in bmap:
            assert abs(v - bmap[key]) < 1e-9
    # recall of the true top-10 with 3/8 cells probed should be substantial
    hits = len(set(imap) & set(bmap))
    assert hits / len(bmap) >= 0.5, (hits, len(bmap))


def test_minhash_lsh_bucket_cap_bounds_skew(spark):
    """10k identical docs all land in ONE bucket per band; the per-bucket cap
    must bound pair output at O(cap^2), not O(k^2) (VERDICT r1 item 7), and
    the Observation must report the dropped row count."""
    from pyspark.sql import Observation

    k, cap = 2000, 50
    docs = spark.createDataFrame(
        [(i, "the same boilerplate page body text repeated verbatim") for i in range(k)],
        "doc_id long, text string",
    )
    obs = Observation("lsh_skew")
    pairs = minhash_lsh_pairs(
        docs, n_hashes=32, bands=8, max_bucket=cap, observation=obs
    ).cache()
    n_pairs = pairs.count()
    # full pairing among the cap lowest ids + one anchor pair (min id) per
    # over-cap member: O(cap^2 + k), not O(k^2)
    assert n_pairs == cap * (cap - 1) // 2 + (k - cap)
    # each of the 8 bands excludes (k - cap) rows from full pairing
    assert obs.get["lsh_bucket_dropped"] == 8 * (k - cap)
    # NO cluster member escapes removal: every id except the survivor (0)
    # appears as a b_id, so curate-style drop(b_id) removes the whole cluster
    b_ids = {r["b_id"] for r in pairs.select("b_id").distinct().collect()}
    assert b_ids == set(range(1, k))


def test_simhash_near_dup_hamming(spark, docs_df):
    fp = simhash_fingerprints(docs_df)
    a = fp.alias("a")
    b = fp.alias("b")
    joined = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 1000, "inner"
    ).select(hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("d"))
    near = [r["d"] for r in joined.collect()]
    assert len(near) == 15
    rnd = fp.filter("doc_id IN (20, 21, 22, 23)").collect()
    far = [
        bin(rnd[i]["simhash"] ^ rnd[j]["simhash"]).count("1")
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    assert sum(near) / len(near) < sum(far) / len(far)
    assert max(near) <= 24  # near-dups stay close in hamming space


def test_rolling_fingerprint_exact(spark, docs_df):
    got = {r["doc_id"]: r["fingerprint"] for r in rolling_fingerprints(docs_df).collect()}
    for r in docs_df.collect():
        assert got[r["doc_id"]] == rolling_fp_py(r["text"])


def test_ann_lsh_subset_of_space_and_sane(spark):
    import math

    rng = random.Random(11)
    rows = []
    for i in range(200):
        v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    brute = ann_brute_topk(emb, n_queries=3, k=10).collect()
    assert len(brute) == 30
    lsh = ann_lsh_topk(emb, n_queries=3, k=10, dim=16).collect()
    assert 0 < len(lsh) <= 30
    bmap = {(r["q_id"], r["vec_id"]): r["cos"] for r in brute}
    # every LSH result's cosine must equal the brute-force cosine (exact
    # scoring inside buckets), and top-1 should usually be recovered
    lmap = {(r["q_id"], r["vec_id"]): r["cos"] for r in lsh}
    for k_, v in lmap.items():
        if k_ in bmap:
            assert abs(v - bmap[k_]) < 1e-9


def test_multimodal_stub(spark, pages_df):
    from sparkdu.multimodal import decode_features, fake_features

    out = decode_features(pages_df.limit(20).select("url", "html")).collect()
    assert len(out) == 20
    for r in out:
        assert r["decode_status"] == "stubbed"
        assert len(r["feature"]) == 8
        assert r["format"] in ("html", "unknown")
        assert r["n_bytes"] > 0
    # deterministic fake features
    row = pages_df.limit(1).collect()[0]
    assert out is not None
    f1 = fake_features(bytes(row["html"]))
    f2 = fake_features(bytes(row["html"]))
    assert f1 == f2


def test_curate_pipeline(spark, pages_df):
    """Composite curation job: counts monotone, dedup actually removes the
    2% dup-url tail via extraction-level dedup, exact dedup is idempotent."""
    from sparkdu.jobs.curate_job import curate

    stages = curate(spark, pages_df, min_quality=0.2, min_chars=50)
    st = stages.pop("_lsh_stats").first()
    cached = stages.pop("_cached")
    assert (st["rows_over_cap"] or 0) == 0  # no skewed buckets here
    assert st["n_buckets"] > 0
    c = {k: v.count() for k, v in stages.items()}
    for df_ in cached:
        df_.unpersist()
    n_urls = pages_df.select("url").distinct().count()
    assert c["extracted"] == n_urls
    assert c["extracted"] >= c["kept"] >= c["exact_deduped"] >= c["curated"]
    assert c["curated"] > 0
    # curated rows carry the quality score and text
    row = stages["curated"].select("url", "quality", "extracted_text").first()
    assert 0.0 <= row["quality"] <= 1.1 and len(row["extracted_text"]) >= 50


def test_compress_ratio_separates_repetitive_from_random(spark):
    """boilerplate-style repetition compresses well below high-entropy prose."""
    import random as _r

    rng = _r.Random(3)
    prose = " ".join(
        "".join(chr(rng.randrange(97, 123)) for _ in range(rng.randint(3, 9)))
        for _ in range(300)
    )
    rows = [(1, "click here | home | about | " * 100), (2, prose), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from sparkdu.harness import QUERIES
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r["compress_ratio"]
               for r in QUERIES["text_compress_ratio"](spark, d).collect()}
    assert out[1] < 0.1 < out[2]
    assert out[3] is None and out[4] is None


def test_stratified_sample_proportions(spark):
    """sampleBy keeps ~the requested fraction per stratum, deterministically
    for a fixed seed."""
    from sparkdu.harness import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in
              base.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got1 = QUERIES["sample_stratified"](spark, sf_dir)
    counts = {r["lang"]: r["n"] for r in
              got1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    fracs = {"en": 0.5, "de": 0.5, "fr": 0.25, "es": 0.25, "zh": 0.1}
    for lang, frac in fracs.items():
        obs = counts.get(lang, 0) / totals[lang]
        assert abs(obs - frac) < 0.15, (lang, obs, frac)
    # determinism for a fixed seed
    a = {r["doc_id"] for r in got1.collect()}
    b = {r["doc_id"] for r in QUERIES["sample_stratified"](spark, sf_dir).collect()}
    assert a == b


def test_minhash_word_shingles_discriminate(spark, docs_df):
    """Broder w-shingling (3-word): one-word-changed copies are caught,
    while independent word-soup docs (high CHAR-5-gram overlap by
    construction) produce no false candidate pairs."""
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(
            docs_df, shingle_k=3, shingle_mode="word"
        ).collect()
    }
    truth = {(j, 1000 + j) for j in range(15)}
    assert len(truth & pairs) / len(truth) >= 0.9
    # every candidate involves a generated near-dup copy (id >= 1000):
    # no pair between two independent base docs
    assert all(b >= 1000 for _, b in pairs), sorted(pairs)[:5]


def test_word_shingles_whitespace_invariant(spark):
    """extracted_text joins blocks with \\n — word shingling must treat any
    whitespace run as one boundary or near-dups across block boundaries
    are silently missed."""
    rows = [(1, "hello world foo bar baz qux"),
            (2, "hello world\nfoo  bar\tbaz qux")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, shingle_k=3, shingle_mode="word").collect()
    assert [(r["a_id"], r["b_id"]) for r in pairs] == [(1, 2)]


def test_curate_short_doc_fallback(spark):
    """VERDICT r2 item 8: near-identical docs below the shingle threshold
    (< SHINGLE_K words) cannot reach LSH — the curate pipeline must still
    collapse their whitespace/case variants via token-normalized exact
    dedup, while distinct short docs all survive."""
    import datetime as dt

    from sparkdu.jobs.curate_job import SHINGLE_K, curate
    from sparkdu.tables import PAGES_SCHEMA

    assert SHINGLE_K == 3
    word = "a" * 150  # long enough that two words clear min_chars
    variants = [
        f"{word} {word}",          # canonical two-word doc
        f"{word}  {word}",         # extra internal whitespace (normalizes same)
        f"{word.upper()} {word}",  # case variant (normalizes same)
    ]
    distinct_short = [f"{word}x {word}", f"{word}y {word}"]
    ts = dt.datetime(2026, 1, 1)
    rows = []
    for i, txt in enumerate(variants + distinct_short):
        html = f"<html><body><p>{txt}</p></body></html>".encode()
        rows.append((f"http://short{i}/", ts, html, None, None))
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    stages = curate(spark, pages, min_quality=0.0, min_chars=10)
    curated = {r["url"] for r in stages["curated"].select("url").collect()}
    for c in stages["_cached"]:
        c.unpersist()
    # exact dedup keeps variants[0] twice? no — byte-distinct, so the
    # short path must do it: exactly one of the three variants survives,
    # both distinct docs survive
    assert len(curated & {"http://short0/", "http://short1/", "http://short2/"}) == 1
    assert {"http://short3/", "http://short4/"} <= curated


def test_contamination_planted(spark):
    """dedup_contamination semantics on a crafted corpus: a train doc
    embedding an exact 5-word eval span is flagged; one sharing only
    4-word spans is not."""
    from sparkdu.staging import _word_grams
    from pyspark.sql import functions as F

    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, eval_text),                                   # eval doc
        (10, "x y " + "alpha beta gamma delta epsilon"),  # 5-word overlap -> hit
        (11, "alpha beta gamma delta QQQ epsilon zeta"),  # max 4-word overlap
        (12, "totally unrelated words only here found"),  # no overlap
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").filter(
        F.size(F.split("text", " ")) >= 5
    )
    gs = docs.select("doc_id", F.explode(_word_grams("text", 5)).alias("g"))
    ev = gs.filter(F.col("doc_id") < 5).select("g").distinct()
    hits = {
        r["doc_id"]
        for r in gs.filter(F.col("doc_id") >= 5)
        .join(F.broadcast(ev), "g", "left_semi")
        .select("doc_id").distinct().collect()
    }
    assert hits == {10}


def test_curate_prefix_routing_no_escape(spark):
    """Coverage invariant (r3 review finding): a doc with >= SHINGLE_K words
    overall but < SHINGLE_K tokens inside the LSH signature prefix must be
    routed to the short path (same tokenizer, same prefix), not silently
    escape both near-dup paths. Case variants of such a doc collapse."""
    import datetime as dt

    from sparkdu.jobs.curate_job import MAX_TEXT_CHARS, curate
    from sparkdu.tables import PAGES_SCHEMA

    blob = "x" * (MAX_TEXT_CHARS + 500)  # one unbroken token spanning the prefix
    rows = []
    ts = dt.datetime(2026, 1, 1)
    for i, tail in enumerate([" foo bar", " FOO bar"]):  # same normalized tokens
        html = f"<html><body><p>{blob}{tail}</p></body></html>".encode()
        rows.append((f"http://prefix{i}/", ts, html, None, None))
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    stages = curate(spark, pages, min_quality=0.0, min_chars=10)
    short_urls = {r["url"] for r in stages["short_docs"].select("url").collect()}
    curated = {r["url"] for r in stages["curated"].select("url").collect()}
    for c in stages["_cached"]:
        c.unpersist()
    # both routed short (3 words overall, but only 1 token in the prefix)
    assert short_urls == {"http://prefix0/", "http://prefix1/"}
    # and the case variants collapse to one survivor
    assert len(curated) == 1


def test_pq_reconstruction_beats_variance(spark):
    """PQ must capture structure: reconstruction MSE well under the data
    variance (MSE == variance is what a codebook of one mean achieves)."""
    import numpy as np

    from sparkdu.dedup import pq_decode, pq_encode, pq_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_fit(emb, dim=64, m=4, ksub=16, iters=3)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    assert all(len(c) == 16 for b in books for c in b)
    rec = pq_decode(pq_encode(emb, books), books).select("embedding", "embedding_pq")
    X, R = [], []
    for r in rec.collect():
        X.append([float(x) for x in r["embedding"]])
        R.append([float(x) for x in r["embedding_pq"]])
    X, R = np.array(X), np.array(R)
    mse = float(((X - R) ** 2).mean())
    var = float(X.var())
    # these embeddings are mostly high-entropy (PQ compresses structure,
    # not noise): require a real margin under the one-mean-codebook bound
    # (MSE == var), observed ~0.73*var on this corpus
    assert mse < 0.85 * var, (mse, var)
    # and the codebooks must actually be used (no collapsed clusters)
    from collections import Counter

    codes = pq_encode(emb, books).select("codes").collect()
    for j in range(4):
        usage = Counter(r["codes"][j] for r in codes)
        assert len(usage) >= 12 and max(usage.values()) < 0.5 * len(codes), (
            j, usage
        )


def test_pq_adc_search_quality(spark):
    """ADC shortlist + exact fp32 rerank vs brute-force L2: the reranked
    top-10 must have high recall, and even the raw ADC set (no rerank)
    must return near-neighbors on average (distance-ratio bound — raw
    ADC recall on these high-entropy embeddings is inherently modest)."""
    import numpy as np

    from sparkdu.dedup import ann_pq_topk, pq_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_fit(emb, dim=64, m=4, ksub=16, iters=3)
    raw = ann_pq_topk(emb, books, n_queries=3, k=10).collect()
    rer = ann_pq_topk(emb, books, n_queries=3, k=10, rerank=100).collect()
    by_raw, by_rer = {}, {}
    for r in raw:
        by_raw.setdefault(r["q_id"], []).append(r["vec_id"])
    for r in rer:
        by_rer.setdefault(r["q_id"], []).append(r["vec_id"])
    for d in (by_raw, by_rer):
        assert set(d) == {0, 1, 2} and all(len(v) == 10 for v in d.values())

    X = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
         for r in emb.collect()}
    raw_ratios, rer_recalls = [], []
    for q in (0, 1, 2):
        d = {v: float(((X[q] - x) ** 2).sum()) for v, x in X.items() if v != q}
        exact = sorted(d, key=lambda v: (d[v], v))[:10]
        raw_ratios.append(
            np.mean([d[v] for v in by_raw[q]]) / np.mean([d[v] for v in exact])
        )
        rer_recalls.append(len(set(exact) & set(by_rer[q])) / 10)
    assert sum(raw_ratios) / 3 < 1.5, raw_ratios
    assert sum(rer_recalls) / 3 >= 0.7, rer_recalls
    # reranked distances must be the true L2 distances (exact re-score)
    for r in rer:
        true = float(((X[r["q_id"]] - X[r["vec_id"]]) ** 2).sum())
        assert abs(r["dist"] - true) < 1e-4, (r, true)


def test_semantic_dedup_planted_clusters(spark):
    """SemDeDup on a hand-built corpus: two well-separated clusters, one
    planted near-dup pair per cluster. Exactly one of each pair drops, and
    the survivor is the LESS prototypical one (lower centroid cosine)."""
    from sparkdu.dedup import semantic_dedup

    def vec(*head):
        return list(head) + [0.0] * (8 - len(head))

    rows = [
        # cluster 0: 0/1 distinct; 2/3 a near-dup pair, 3 more prototypical
        (0, vec(5.0, 2.0)),
        (1, vec(5.0, -2.0, 1.0)),
        (2, vec(6.0, 0.9, 0.2)),
        (3, vec(6.0, 0.6)),
        # cluster 1: 4 distinct; 5/6 near-dups, 5 more prototypical
        (4, vec(0.0, 5.0, 2.0)),
        (5, vec(0.4, 6.0)),
        (6, vec(0.6, 6.0, 0.1)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [vec(5.0), vec(0.0, 5.0)]
    out = {r["vec_id"]: r for r in semantic_dedup(emb, cents, 0.99).collect()}
    assert len(out) == 7
    # cluster assignment correct
    assert all(out[i]["cell"] == 0 for i in (0, 1, 2, 3))
    assert all(out[i]["cell"] == 1 for i in (4, 5, 6))
    # exactly one of each planted pair dropped; singletons keep
    for i in (0, 1, 4):
        assert out[i]["keep"], i
    assert out[2]["keep"] != out[3]["keep"]
    assert out[5]["keep"] != out[6]["keep"]
    # the published keep rule: survivor has the LOWER centroid cosine
    kept23 = 2 if out[2]["keep"] else 3
    drop23 = 5 - kept23
    assert out[kept23]["cent_cos"] <= out[drop23]["cent_cos"]


def test_semantic_dedup_high_entropy_keeps_everything(spark):
    """Random high-entropy embeddings have no semantic dups at 0.99 —
    nothing should drop, and the result must be deterministic."""
    from sparkdu.dedup import ivf_fit, semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_fit(emb, dim=64, k=8, iters=2)
    r1 = semantic_dedup(emb, cents, 0.99).orderBy("vec_id").collect()
    assert all(r["keep"] for r in r1)
    assert emb.count() == len(r1)
    r2 = semantic_dedup(emb, cents, 0.99).orderBy("vec_id").collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


# ---------------------------------------------------------------------
# Exact duplicated-substring spans (Lee et al. 2021 analogue)
# ---------------------------------------------------------------------


def test_duplicate_spans_planted_passage(spark):
    """A 12-token passage planted in two docs yields exactly one maximal
    span per doc covering the passage; unique text yields nothing."""
    from sparkdu.dedup import duplicate_spans

    passage = " ".join(f"dup{i}" for i in range(12))
    uniq_a = " ".join(f"ua{i}" for i in range(10))
    uniq_b = " ".join(f"ub{i}" for i in range(7))
    docs = spark.createDataFrame(
        [
            (0, f"{uniq_a} {passage} tail0a tail0b"),
            (1, f"{passage} {uniq_b}"),
            (2, "totally unique words " + " ".join(f"z{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_spans(docs, l=8).collect()}
    assert set(out) == {0, 1}
    # doc 0: passage occupies token indices [10, 22)
    assert (out[0]["span_start"], out[0]["span_end"]) == (10, 22)
    # doc 1: passage at the front, [0, 12)
    assert (out[1]["span_start"], out[1]["span_end"]) == (0, 12)
    # 12-token passage has 12-8+1 = 5 duplicated windows
    assert out[0]["n_windows"] == 5 and out[1]["n_windows"] == 5


def test_duplicate_spans_within_doc_and_merge(spark):
    """Within-doc repetition counts as duplication (corpus-wide count>1),
    and two separated duplicated regions stay two spans while touching
    regions merge."""
    from sparkdu.dedup import duplicate_spans

    block = " ".join(f"r{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, f"{block} {gap} {block}")],
        "doc_id long, text string",
    )
    out = sorted(
        duplicate_spans(docs, l=8).collect(), key=lambda r: r["span_start"]
    )
    assert [(r["span_start"], r["span_end"]) for r in out] == [(0, 8), (28, 36)]


def test_duplicate_spans_whole_doc_dup(spark):
    """Two identical docs are each covered by one full-length span."""
    from sparkdu.dedup import duplicate_spans

    text = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    for r in duplicate_spans(docs, l=8).collect():
        assert (r["span_start"], r["span_end"]) == (0, 30)
        assert r["n_windows"] == 23


def test_span_rewrite_first_occurrence_survives(spark):
    """The globally-first copy of a duplicated passage (lowest (doc_id,
    pos)) keeps its text; the later copy loses exactly the passage."""
    from sparkdu.dedup import span_dedup_rewrite

    passage = " ".join(f"dup{i}" for i in range(10))
    pre = " ".join(f"pre{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            (0, passage + " " + " ".join(f"a{i}" for i in range(6))),
            (1, f"{pre} {passage}"),
            (2, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup_rewrite(docs, l=8).collect()}
    assert out[0]["n_removed"] == 0  # first occurrence untouched
    assert out[1]["n_removed"] == 10
    assert out[1]["kept_text"] == pre
    assert out[2]["n_removed"] == 0 and out[2]["kept_text"] == "short doc"
    # token accounting holds
    for r in out.values():
        assert r["n_tokens"] - r["n_removed"] == len(
            [w for w in r["kept_text"].split(" ") if w]
        )


def test_span_rewrite_idempotent_on_unique_corpus(spark):
    """A high-entropy corpus with no repeated 8-gram comes back verbatim
    (lowercased recipe aside — inputs here are already lowercase)."""
    from sparkdu.dedup import span_dedup_rewrite

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(6)],
        "doc_id long, text string",
    )
    for r in span_dedup_rewrite(docs, l=8).collect():
        assert r["n_removed"] == 0
        assert r["kept_text"].startswith(f"w{r['doc_id']}x0 ")


def test_curate_span_dedup_stage(spark):
    """--span-dedup curate mode: survivor count is unchanged (the stage
    rewrites, never drops), removal totals are consistent, and with
    lowercase=False the surviving text keeps its original casing."""
    from sparkdu.harness import f
    from sparkdu.jobs.curate_job import curate

    pages = f(spark, "pages").limit(200)
    plain = curate(spark, pages)
    withspans = curate(spark, pages, span_dedup=True)
    try:
        base = {r["url"]: r["extracted_text"]
                for r in plain["curated"].collect()}
        rew = {r["url"]: r for r in withspans["curated"].collect()}
        assert set(base) == set(rew)
        changed = 0
        for url, r in rew.items():
            assert r["n_removed"] >= 0
            if r["n_removed"] > 0:
                changed += 1
                assert len(r["extracted_text"]) < len(base[url])
            else:
                # whitespace-collapse aside, unchanged docs keep their text
                assert r["extracted_text"] == " ".join(base[url].split())
    finally:
        for c in plain["_cached"] + withspans["_cached"]:
            c.unpersist()


def test_countmin_overestimate_and_merge(spark):
    """CMS guarantees: estimate >= exact for every key, the top-key
    estimates are within eps*N, and two half-corpus sketches merged via
    the JVM API give the same estimates as the single full sketch."""
    from pyspark.sql import functions as F

    from sparkdu.harness import f

    toks = f(spark, "pages").select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0).cache()
    try:
        n = toks.count()
        eps = 0.0001
        args = (F.lit(eps), F.lit(0.99), F.lit(7))

        def sketch(df):
            b = df.agg(F.count_min_sketch("tok", *args).alias("s")).collect()
            jvm = spark._jvm
            return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
                jvm.java.io.ByteArrayInputStream(bytes(b[0]["s"]))
            )

        full = sketch(toks)
        exact = {r["tok"]: r["count"] for r in
                 toks.groupBy("tok").count().orderBy(
                     F.col("count").desc()).limit(20).collect()}
        for tok, c in exact.items():
            est = full.estimateCount(tok)
            assert est >= c, (tok, est, c)
            assert est <= c + eps * n * 3, (tok, est, c, n)

        h = F.pmod(F.xxhash64("tok"), F.lit(2))
        a = sketch(toks.filter(h == 0))
        b = sketch(toks.filter(h == 1))
        a.mergeInPlace(b)
        assert a.totalCount() == full.totalCount()
        for tok in exact:
            assert a.estimateCount(tok) == full.estimateCount(tok), tok
    finally:
        toks.unpersist()


def test_ivfpq_recall_and_residual_advantage(spark):
    """IVF-PQ with exact rerank recovers most of the brute-force top-10
    inside its probed cells, and residual quantization reconstructs
    better (lower MSE) than raw-vector PQ with the same code budget."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkdu.dedup import (ann_brute_topk, ann_ivfpq_topk, ivf_fit,
                               pq_decode, pq_encode, pq_fit, with_ivf_cell)
    from sparkdu.harness import t

    e = t(spark, "/root/testdata/sf0.001", "embeddings").cache()
    try:
        dim = len(e.first()["embedding"])
        got = ann_ivfpq_topk(e, dim=dim, coarse_k=8, nprobe=8, m=4,
                             ksub=16, n_queries=3, k=10, rerank=50)
        brute = ann_brute_topk(e, n_queries=3, k=10)
        mine = {(r["q_id"], r["vec_id"]) for r in got.collect()}
        ref = {(r["q_id"], r["vec_id"]) for r in brute.collect()}
        # nprobe == coarse_k probes EVERY cell: rerank makes the exact
        # top-10 recoverable whenever it survives the ADC shortlist
        recall = len(mine & ref) / len(ref)
        assert recall >= 0.7, recall

        # residual PQ must reconstruct better than raw PQ
        cents = ivf_fit(e, dim, k=8)
        assigned = with_ivf_cell(e, cents)
        from sparkdu.dedup import _book_lit

        resid = assigned.select(
            "vec_id", "cell",
            F.zip_with(
                "embedding",
                F.element_at(_book_lit(cents), F.col("cell") + 1),
                lambda a, b: a.cast("double") - b,
            ).alias("embedding"),
        )

        def mse(tab):
            books = pq_fit(tab, dim, m=4, ksub=16)
            dec = pq_decode(pq_encode(tab, books), books)
            return dec.select(
                F.avg(
                    F.aggregate(
                        F.zip_with(
                            "embedding", "embedding_pq",
                            lambda a, b: (a.cast("double") - b) *
                            (a.cast("double") - b),
                        ),
                        F.lit(0.0), lambda acc, x: acc + x,
                    )
                ).alias("m")
            ).first()["m"]

        assert mse(resid) < mse(e.select("vec_id", "embedding")), \
            "residual quantization should beat raw"
    finally:
        e.unpersist()


def test_url_canon_latest_semantics(spark):
    """Recrawl dedup by canonical url (staging.dedup_url_canon_latest):
    every canonical key collapses its two planted captures to exactly one
    survivor — the LATER (+1h messy) capture — and the canonical form is
    the clean lowercase/no-port/no-tracking url."""
    from sparkdu.harness import FIX
    from sparkdu.staging import dedup_url_canon_latest

    out = dedup_url_canon_latest(spark, FIX).cache()
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        # one planted messy recrawl per fixture capture -> even count >= 2
        # (the fixture itself contains recrawled urls, so counts can be 4+)
        assert r.n_captures >= 2 and r.n_captures % 2 == 0
        # the +1h messy plant of the LATEST fixture capture always wins
        assert r.kept_url.startswith("HTTPS://")
        # canonical form: lowercase, default port stripped, fragment and
        # tracking params gone, one surviving (empty) query -> none
        assert r.canon_url == r.canon_url.lower()
        assert ":443" not in r.canon_url
        assert "#" not in r.canon_url and "utm_" not in r.canon_url
        assert "gclid" not in r.canon_url
    # canonical keys are unique (one survivor per key)
    assert out.select("canon_url").distinct().count() == len(rows)
    out.unpersist()
