"""Funnel ordering semantics + z-order locality property."""

import datetime as dt


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_order_matters(spark):
    """A click BEFORE the first view doesn't advance the funnel; one
    strictly-ordered v->c->p chain reaches stage 3."""
    from sparkdu.staging import win_event_funnel

    rows = [
        # user 1: click at t0 (too early), view t1, purchase t2 but no
        # click after the view -> stage 1
        (1, "click", _ts(0)), (1, "view", _ts(1)), (1, "purchase", _ts(2)),
        # user 2: full ordered chain -> stage 3
        (2, "view", _ts(0)), (2, "click", _ts(1)), (2, "purchase", _ts(2)),
        # user 3: view then click, purchase before the click -> stage 2
        (3, "view", _ts(0)), (3, "purchase", _ts(1)), (3, "click", _ts(2)),
        # user 4: never views -> absent from the funnel entirely
        (4, "click", _ts(0)), (4, "purchase", _ts(1)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )

    import sparkdu.harness as H
    orig = H.t
    H.t = lambda s, d, name: ev  # the funnel only reads `events`
    try:
        import sparkdu.staging as st
        st.t = H.t
        out = {r["user_id"]: r["stage"]
               for r in win_event_funnel(spark, "ignored").collect()}
    finally:
        H.t = orig
        st.t = orig
    assert out == {1: 1, 2: 3, 3: 2}


def test_zorder_locality_beats_single_column_sort(spark):
    """Chunking the z-ordered table into 'files' yields a much smaller
    total min/max range on the SECOND dimension than doc_id order does —
    the property that makes file-stat pruning work on both columns."""
    from sparkdu.staging import layout_zorder

    import sparkdu.staging as st

    from pyspark.sql import functions as F

    n = 1024

    # n_chars deliberately uncorrelated with doc_id (bit-reversed index)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(9)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (F.floor(F.col("id") / F.pow(F.lit(2.0), i)).cast("long") % 2)
            .cast("double").cast("long")
            * F.pow(F.lit(2.0), 9 - i).cast("long"),
        ).alias("n_chars"),
    )
    orig = st.t
    st.t = lambda s, d, name: docs
    try:
        z = layout_zorder(spark, "ignored").join(docs, "doc_id")
    finally:
        st.t = orig
    rows = z.orderBy("zvalue").collect()
    chunk = 64

    def spread(ordered, key):
        tot = 0
        for i in range(0, len(ordered), chunk):
            vals = [r[key] for r in ordered[i:i + chunk]]
            tot += max(vals) - min(vals)
        return tot

    z_spread = spread(rows, "n_chars")
    id_rows = sorted(rows, key=lambda r: r["doc_id"])
    id_spread = spread(id_rows, "n_chars")
    # doc_id order leaves n_chars ranges near-full-width per chunk;
    # z-order must cut the total spread at least 4x
    assert z_spread * 4 <= id_spread, (z_spread, id_spread)


def test_chunker_covers_every_token_with_overlap(spark):
    """Chunk windows tile each doc completely: starts advance by the
    stride, consecutive chunks overlap by W-S tokens, the final chunk
    ends exactly at len, and reassembling non-overlap regions
    reconstructs the doc."""
    from sparkdu.staging import text_chunk_windows

    import sparkdu.staging as st
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(100))),   # multiple chunks
         (1, " ".join(f"s{i}" for i in range(32))),    # exactly one window
         (2, "tiny doc"),                              # sub-window
         (3, " ".join(f"u{i}" for i in range(33)))],   # one full + partial
        "doc_id long, text string",
    )
    orig = st.t
    st.t = lambda s, d, name: docs
    try:
        rows = text_chunk_windows(spark, "x").collect()
    finally:
        st.t = orig
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n_toks = len(docs.collect()[doc_id]["text"].split(" "))
        assert chunks[0]["tok_start"] == 0
        assert chunks[-1]["tok_end"] == n_toks
        for a, b in zip(chunks, chunks[1:]):
            assert b["tok_start"] - a["tok_start"] == 24  # stride
            assert a["tok_end"] > b["tok_start"]          # overlap
        # non-overlap reassembly: take [tok_start, next.tok_start) slices
        toks = []
        for i, c in enumerate(chunks):
            words = c["chunk"].split(" ")
            upto = (chunks[i + 1]["tok_start"] - c["tok_start"]
                    if i + 1 < len(chunks) else len(words))
            toks.extend(words[:upto])
        assert " ".join(toks) == docs.collect()[doc_id]["text"]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == "tiny doc"
    assert len(by_doc[1]) == 1 and len(by_doc[3]) == 2


def test_domain_split_no_leakage(spark):
    """Every page of a domain lands in the same split (the anti-leak
    invariant) and all three splits are populated at fixture scale."""
    from sparkdu.staging import split_domain_disjoint

    out = split_domain_disjoint(spark, "x")
    per_host = out.groupBy("host").agg(
        __import__("pyspark").sql.functions.count_distinct("split").alias("k")
    ).collect()
    assert per_host and all(r["k"] == 1 for r in per_host)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "valid", "test"}
