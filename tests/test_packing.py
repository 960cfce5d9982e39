"""Invariants for sequence packing and the other post-freeze training-data
ops (PII redaction, paragraph dedup, temperature sampling)."""

import re

from pyspark.sql import functions as F

import sparkdu.staging  # noqa: F401  (registers the post-freeze keys)
from sparkdu.harness import QUERIES, fx
from sparkdu.packing import pack_chunks, pack_greedy, token_counts

SF = "/root/testdata/sf0.001"
BUDGET = 100  # tight budget so overflow paths actually fire at sf0.001


def _docs(spark):
    return token_counts(
        spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "source", "text"
        )
    )


def test_greedy_packing_invariants(spark):
    docs = _docs(spark)
    toks = {r["doc_id"]: r["n_tok"] for r in docs.collect()}
    out = pack_greedy(docs, BUDGET).collect()

    # full coverage, token counts intact
    assert {r["doc_id"] for r in out} == set(toks)
    assert all(toks[r["doc_id"]] == r["n_tok"] for r in out)

    by_bin = {}
    for r in out:
        by_bin.setdefault((r["group_key"], r["bin_id"]), []).append(r)
    overflowed = [k for k, rows in by_bin.items()
                  if sum(r["n_tok"] for r in rows) > BUDGET]
    # a bin over budget must be a single oversized doc
    for k in overflowed:
        assert len(by_bin[k]) == 1 and by_bin[k][0]["n_tok"] > BUDGET
    assert any(len(v) > 1 for v in by_bin.values()), "budget never packed >1 doc"

    # bins are contiguous 0..max and monotone in doc order within a group
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_key"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r["doc_id"])
        bins = [r["bin_id"] for r in rows]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))

    # determinism
    again = pack_greedy(docs, BUDGET).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_greedy_never_splits_mid_bin_unnecessarily(spark):
    """A doc goes into the current bin whenever it fits: reconstruct the
    greedy recurrence independently in Python and compare assignments."""
    docs = _docs(spark)
    rows = sorted(
        ((r["source"], r["doc_id"], r["n_tok"]) for r in docs.collect())
    )
    expect = {}
    cur = {}
    for src, did, n in rows:
        b, tok = cur.get(src, (0, 0))
        if tok > 0 and tok + n > BUDGET:
            b, tok = b + 1, 0
        expect[did] = b
        cur[src] = (b, tok + n)
    got = {r["doc_id"]: r["bin_id"] for r in pack_greedy(docs, BUDGET).collect()}
    assert got == expect


def test_chunk_packing_conserves_tokens(spark):
    docs = _docs(spark)
    total = docs.agg(F.sum("n_tok")).first()[0]
    out = pack_chunks(docs, BUDGET).collect()
    assert sum(r["chunk_tokens"] for r in out) == total
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r["chunk_id"])
    for ids in by_group.values():
        ids.sort()
        assert ids[0] == 0 and ids == list(range(ids[0], ids[-1] + 1))


def test_pii_redaction_leaves_no_matches(spark):
    out = QUERIES["text_pii_redact"](spark, SF).collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\+\d{1,2} \d{3}-\d{4}")
    ipv4 = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    assert len(out) > 0
    for r in out:
        assert not email.search(r["redacted"])
        assert not phone.search(r["redacted"])
        assert not ipv4.search(r["redacted"])
        # the planted PII was really there to find
        assert r["n_email"] >= 1 and r["n_phone"] >= 1 and r["n_ip"] >= 1
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        assert "<IP>" in r["redacted"]


def test_para_dedup_drops_every_later_copy(spark):
    nodes = spark.read.parquet(fx("nodes")).select("url", "node_id", "text")
    out = QUERIES["text_para_dedup"](spark, SF).collect()
    seen = {}
    for r in out:
        for para in r["dedup_text"].split("\n"):
            assert para not in seen, f"dup para survived in {r['url']} and {seen[para]}"
            seen[para] = r["url"]
    n_distinct = nodes.select("text").distinct().count()
    assert sum(r["n_kept"] for r in out) == n_distinct == len(seen)
    # first-occurrence rule: the survivor is the minimal (url, node_id)
    first = {
        r["text"]: r["url"]
        for r in nodes.groupBy("text")
        .agg(F.min(F.struct("url", "node_id")).alias("m"))
        .select("text", F.col("m.url").alias("url"))
        .collect()
    }
    assert all(first[p] == u for p, u in seen.items())


def test_domain_temperature_sampling_quota(spark):
    import math

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {r["source"]: r["cnt"] for r in
              docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    out = QUERIES["sample_domain_temp"](spark, SF).collect()
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    assert set(got) == set(counts)
    for src, cnt in counts.items():
        assert got[src] == min(cnt, math.ceil(math.sqrt(cnt)))
    # deterministic
    again = QUERIES["sample_domain_temp"](spark, SF).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_url_canonicalization_semantics(spark):
    out = QUERIES["fn_url_canon"](spark, SF).collect()
    assert len(out) > 0
    for r in out:
        m = re.search(r"/(\d+)$", r["url"])
        n = m.group(1) if m else ""  # non-numeric tails plant an empty id
        host = r["url"].split("://")[1].split("/")[0]
        # fragment gone, tracking params gone, params sorted, port stripped
        assert r["canon_url"] == f"https://{host}/{n}?a={n}&z=26", r
        assert "#" not in r["canon_url"] and "utm" not in r["canon_url"]


def test_lm_score_orders_in_vs_out_of_distribution(spark):
    """A doc of corpus-frequent tokens must outscore rare-token docs: check
    the score is monotone with average token frequency."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    scores = {r["doc_id"]: r["lm_score"]
              for r in QUERIES["text_lm_score"](spark, SF).collect()}
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    freq = {
        r["doc_id"]: r["mf"]
        for r in toks.join(vocab, "tok").groupBy("doc_id")
        .agg(F.avg(F.log("cnt")).alias("mf")).collect()
    }
    ranked_by_score = sorted(scores, key=lambda d: scores[d])
    ranked_by_freq = sorted(freq, key=lambda d: freq[d])
    # same extreme deciles (scores are a monotone transform of mean log cnt
    # up to the constant smoothing shift)
    k = len(ranked_by_score) // 10
    assert set(ranked_by_score[:k]) == set(ranked_by_freq[:k])
    assert set(ranked_by_score[-k:]) == set(ranked_by_freq[-k:])


def test_split_assign_stable_and_stratified(spark):
    out = QUERIES["sample_split_assign"](spark, SF).collect()
    n = len(out)
    frac = {s: sum(1 for r in out if r["split"] == s) / n
            for s in ("train", "val", "test")}
    assert 0.6 < frac["train"] < 0.95 and frac["val"] > 0 and frac["test"] > 0
    # content-stable: identical assignment on a re-run and independent of
    # row order / partitioning
    again = {
        (r["doc_id"]): r["split"]
        for r in QUERIES["sample_split_assign"](spark, SF).collect()
    }
    assert all(again[r["doc_id"]] == r["split"] for r in out)


def test_hll_sketches_merge_exactly_and_estimate_well(spark):
    out = {r["source"]: r["est_distinct"]
           for r in QUERIES["agg_hll_mergeable"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    true_all = toks.select("tok").distinct().count()
    # union-of-group-sketches == one global sketch (register-max identity)
    direct = toks.agg(F.hll_sketch_agg("tok").alias("sk")).select(
        F.hll_sketch_estimate("sk").cast("long").alias("e")).first()["e"]
    assert out["__all__"] == direct
    assert abs(out["__all__"] - true_all) / true_all < 0.05
    for src, cnt in [(r["source"], r["cnt"]) for r in
                     toks.groupBy("source").agg(
                         F.countDistinct("tok").alias("cnt")).collect()]:
        assert abs(out[src] - cnt) / cnt < 0.08, (src, out[src], cnt)
