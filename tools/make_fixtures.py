"""Generate the committed fixture parquet files under fixtures_data/.

Deterministic (seed 42). Uses the ORACLE (normative implementation) to derive
golden_extracted and the nodes fixture — the Spark pipeline is then checked
against these (T1/T2), so fixture generation must never import sparkdu's
Spark code paths. stdlib + pyarrow only; no JVM needed.

Run: python tools/make_fixtures.py  (from repo root)
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import extract as orc  # noqa: E402
from sparkdu import fixtures  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures_data")
N_PAGES = 1000

SPAN_T = pa.list_(
    pa.struct([("node_id", pa.int32()), ("start", pa.int64()), ("end", pa.int64())])
)


def write(name: str, table: pa.Table) -> None:
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, os.path.join(OUT, name), compression="zstd")
    print(f"wrote {name}: {table.num_rows} rows")


def main() -> None:
    rows = fixtures.gen_rows(N_PAGES)
    pages = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    write("pages.parquet", pages)

    # latest-per-url (J9) basis for golden + nodes; row index i == doc_id
    latest: dict[str, dict] = {}
    latest_doc_id: dict[str, int] = {}
    for i, r in enumerate(rows):
        if r["url"] not in latest or r["warc_ts"] > latest[r["url"]]["warc_ts"]:
            latest[r["url"]] = r
            latest_doc_id[r["url"]] = i

    g_url, g_bytes, g_sha, g_nb, g_spans = [], [], [], [], []
    n_cols: dict[str, list] = {
        k: []
        for k in (
            "url part_id node_id tag attrs_json depth text n_chars n_links link_density "
            "punct_ratio digit_ratio caps_ratio anc_boiler x1 y1 x2 y2 "
            "is_content block_seq text_start text_end"
        ).split()
    }
    for url in sorted(latest):
        r = latest[url]
        o = orc.extract_page(url, r["html"])
        b = o["extracted_text"].encode("utf-8")
        g_url.append(url)
        g_bytes.append(b)
        g_sha.append(hashlib.sha256(b).hexdigest())
        g_nb.append(o["n_blocks"])
        g_spans.append(o["spans"])
        for nd in sorted(o["nodes"], key=lambda d: d["node_id"]):
            n_cols["url"].append(url)
            n_cols["part_id"].append(nd["part_id"])
            n_cols["attrs_json"].append(
                json.dumps(nd["attrs"], sort_keys=True, ensure_ascii=False)
            )
            for k in (
                "node_id tag depth text n_chars n_links link_density punct_ratio "
                "digit_ratio caps_ratio anc_boiler x1 y1 x2 y2 is_content"
            ).split():
                n_cols[k].append(nd[k])
            n_cols["block_seq"].append(nd.get("block_seq"))
            n_cols["text_start"].append(nd.get("text_start"))
            n_cols["text_end"].append(nd.get("text_end"))

    # fragments: MultiPageXml-split analogue inputs (SURVEY SS3.3) — each
    # utf-8 multi-part page split on the SPEC SS2 pagination marker
    f_url, f_seq, f_frag = [], [], []
    for url in sorted(latest):
        b = latest[url]["html"]
        try:
            s = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if fixtures.PART_SEP not in s:
            continue
        for i, frag in enumerate(s.split(fixtures.PART_SEP)):
            f_url.append(url)
            f_seq.append(i)
            f_frag.append(frag)
    write(
        "fragments.parquet",
        pa.table(
            {
                "url": f_url,
                "part_seq": pa.array(f_seq, pa.int64()),
                "frag": f_frag,
            }
        ),
    )

    # warcish shards: the same pages rows in the custom record-container
    # format (sparkdu/sources.py) — scan_warcish cross-checks the Python
    # DataSource against the parquet truth
    from sparkdu.sources import write_shard

    wdir = os.path.join(OUT, "pages_warcish")
    os.makedirs(wdir, exist_ok=True)
    for old in glob.glob(os.path.join(wdir, "*.warcish")):
        os.remove(old)
    n_shards = 4
    per = (len(rows) + n_shards - 1) // n_shards
    total = 0
    for s in range(n_shards):
        chunk = rows[s * per : (s + 1) * per]
        total += write_shard(
            os.path.join(wdir, f"shard-{s:04d}.warcish"),
            ((r["url"], r["warc_ts"], r["html"]) for r in chunk),
        )
    print(f"wrote pages_warcish/: {total} records in {n_shards} shards")

    # images: synthetic multimodal payloads with generator-truth columns —
    # the operator parses headers independently; the oracle reads the truth
    img = {"img_id": [], "payload": [], "fmt": [], "w": [], "h": []}
    for i in range(300):
        payload, fmt_, w_, h_ = fixtures.synth_image_bytes(i)
        img["img_id"].append(i)
        img["payload"].append(payload)
        img["fmt"].append(fmt_)
        img["w"].append(w_)
        img["h"].append(h_)
    write(
        "images.parquet",
        pa.table(
            {
                "img_id": pa.array(img["img_id"], pa.int64()),
                "payload": pa.array(img["payload"], pa.binary()),
                "fmt": img["fmt"],
                "w": pa.array(img["w"], pa.int32()),
                "h": pa.array(img["h"], pa.int32()),
            }
        ),
    )

    write(
        "golden_extracted.parquet",
        pa.table(
            {
                "url": g_url,
                "extracted_text": pa.array(g_bytes, pa.binary()),
                "text_sha256": g_sha,
                "n_blocks": pa.array(g_nb, pa.int32()),
                "spans": pa.array(g_spans, SPAN_T),
            }
        ),
    )
    write(
        "nodes.parquet",
        pa.table(
            {
                "url": n_cols["url"],
                "part_id": pa.array(n_cols["part_id"], pa.int32()),
                "node_id": pa.array(n_cols["node_id"], pa.int32()),
                "tag": n_cols["tag"],
                "attrs_json": n_cols["attrs_json"],
                "depth": pa.array(n_cols["depth"], pa.int32()),
                "text": n_cols["text"],
                "n_chars": pa.array(n_cols["n_chars"], pa.int32()),
                "n_links": pa.array(n_cols["n_links"], pa.int32()),
                "link_density": pa.array(n_cols["link_density"], pa.float64()),
                "punct_ratio": pa.array(n_cols["punct_ratio"], pa.float64()),
                "digit_ratio": pa.array(n_cols["digit_ratio"], pa.float64()),
                "caps_ratio": pa.array(n_cols["caps_ratio"], pa.float64()),
                "anc_boiler": pa.array(n_cols["anc_boiler"], pa.bool_()),
                "x1": pa.array(n_cols["x1"], pa.float64()),
                "y1": pa.array(n_cols["y1"], pa.float64()),
                "x2": pa.array(n_cols["x2"], pa.float64()),
                "y2": pa.array(n_cols["y2"], pa.float64()),
                "is_content": pa.array(n_cols["is_content"], pa.bool_()),
                "block_seq": pa.array(n_cols["block_seq"], pa.int32()),
                "text_start": pa.array(n_cols["text_start"], pa.int64()),
                "text_end": pa.array(n_cols["text_end"], pa.int64()),
            }
        ),
    )

    # labels: generator-intent ground truth (content paragraph/cell texts)
    l_url, l_nid, l_lab = [], [], []
    for url in sorted(latest):
        r = latest[url]
        content_texts = fixtures.content_text_set(latest_doc_id[url])
        o = orc.extract_page(url, r["html"])
        for nd in o["nodes"]:
            l_url.append(url)
            l_nid.append(nd["node_id"])
            l_lab.append("content" if nd["text"] in content_texts else "boiler")
    write(
        "labels.parquet",
        pa.table({"url": l_url, "node_id": pa.array(l_nid, pa.int32()), "gt_label": l_lab}),
    )

    # geo: synthetic 2D multi-part page layout for J1-J4 with real geometry
    rng = random.Random(4242)
    g: dict[str, list] = {k: [] for k in "url part_id node_id x1 y1 x2 y2 tag".split()}
    r_cols: dict[str, list] = {k: [] for k in "url part_id region_id x1 y1 x2 y2".split()}
    for u in range(40):
        url = f"https://geo.example/{u:x}"
        for part in range(rng.randint(1, 3)):
            ncols = rng.randint(1, 3)
            col_w = 1000.0 / ncols
            nid = 0 if part == 0 else g["node_id"][-1] + 1
            for ci in range(ncols):
                y = 50.0 * rng.random()
                while y < 1400:
                    h = rng.uniform(20, 120)
                    w = col_w * rng.uniform(0.6, 0.95)
                    x1 = ci * col_w + col_w * 0.02 * rng.random()
                    g["url"].append(url)
                    g["part_id"].append(part)
                    g["node_id"].append(nid)
                    g["x1"].append(round(x1, 3))
                    g["y1"].append(round(y, 3))
                    g["x2"].append(round(x1 + w, 3))
                    g["y2"].append(round(y + h, 3))
                    g["tag"].append(rng.choice(["p", "div", "h2", "td"]))
                    nid += 1
                    y += h + rng.uniform(5, 60)
            for ri in range(rng.randint(2, 5)):
                rx1 = rng.uniform(0, 600)
                ry1 = rng.uniform(0, 900)
                r_cols["url"].append(url)
                r_cols["part_id"].append(part)
                r_cols["region_id"].append(ri)
                r_cols["x1"].append(round(rx1, 3))
                r_cols["y1"].append(round(ry1, 3))
                r_cols["x2"].append(round(rx1 + rng.uniform(200, 400), 3))
                r_cols["y2"].append(round(ry1 + rng.uniform(200, 500), 3))
    write(
        "geo.parquet",
        pa.table(
            {
                "url": g["url"],
                "part_id": pa.array(g["part_id"], pa.int32()),
                "node_id": pa.array(g["node_id"], pa.int32()),
                "x1": pa.array(g["x1"], pa.float64()),
                "y1": pa.array(g["y1"], pa.float64()),
                "x2": pa.array(g["x2"], pa.float64()),
                "y2": pa.array(g["y2"], pa.float64()),
                "tag": g["tag"],
            }
        ),
    )
    write(
        "regions.parquet",
        pa.table(
            {
                "url": r_cols["url"],
                "part_id": pa.array(r_cols["part_id"], pa.int32()),
                "region_id": pa.array(r_cols["region_id"], pa.int32()),
                "x1": pa.array(r_cols["x1"], pa.float64()),
                "y1": pa.array(r_cols["y1"], pa.float64()),
                "x2": pa.array(r_cols["x2"], pa.float64()),
                "y2": pa.array(r_cols["y2"], pa.float64()),
            }
        ),
    )


def make_edges() -> None:
    """edges.parquet over geo.parquet via DuckDB (independent of sparkdu.graph;
    the normative NOT-EXISTS form of the SPEC edge semantics)."""
    import duckdb

    geo = os.path.join(OUT, "geo.parquet")
    axis = """
    SELECT a.url, a.node_id AS src_node_id, b.node_id AS dst_node_id,
           '{et}' AS edge_type,
           b.{slo} - a.{shi} AS dist,
           least(a.{ohi}, b.{ohi}) - greatest(a.{olo}, b.{olo}) AS overlap
    FROM read_parquet('{geo}') a JOIN read_parquet('{geo}') b
      ON a.url = b.url AND a.part_id = b.part_id
     AND a.{shi} <= b.{slo}
     AND least(a.{ohi}, b.{ohi}) - greatest(a.{olo}, b.{olo}) > 0
    WHERE NOT EXISTS (
      SELECT 1 FROM read_parquet('{geo}') c
      WHERE c.url = a.url AND c.part_id = a.part_id
        AND a.{shi} <= c.{slo} AND c.{shi} <= b.{slo}
        AND least(a.{ohi}, c.{ohi}) > greatest(a.{olo}, c.{olo})
        AND least(b.{ohi}, c.{ohi}) > greatest(b.{olo}, c.{olo}))
    """
    v = axis.format(et="v", slo="y1", shi="y2", olo="x1", ohi="x2", geo=geo)
    h = axis.format(et="h", slo="x1", shi="x2", olo="y1", ohi="y2", geo=geo)
    x = f"""
    SELECT a.url, a.node_id AS src_node_id, b.node_id AS dst_node_id,
           'xpart' AS edge_type,
           (sa.max_y2 - a.y2) + (b.y1 - sb.min_y1) AS dist, 0.0 AS overlap
    FROM read_parquet('{geo}') a
    JOIN stats sa ON sa.url = a.url AND sa.part_id = a.part_id
    JOIN stats sb ON sb.url = a.url AND sb.part_id = a.part_id + 1
    JOIN read_parquet('{geo}') b ON b.url = a.url AND b.part_id = a.part_id + 1
    WHERE a.y2 >= sa.max_y2 - 200.0 AND b.y1 <= sb.min_y1 + 200.0
    """
    stats = (
        f"WITH stats AS (SELECT url, part_id, max(y2) AS max_y2, min(y1) AS min_y1 "
        f"FROM read_parquet('{geo}') GROUP BY url, part_id) "
    )
    con = duckdb.connect()
    con.sql(
        f"COPY ({stats} {v} UNION ALL {h} UNION ALL {x}) TO "
        f"'{os.path.join(OUT, 'edges.parquet')}' (FORMAT parquet, COMPRESSION zstd)"
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{os.path.join(OUT, 'edges.parquet')}')").fetchone()[0]
    print(f"wrote edges.parquet: {n} rows")


def make_audio() -> None:
    """audio.parquet: deterministic WAV payloads with generator-truth
    features (computed from the exact quantized samples written into the
    container). Every 11th payload is truncated with null truth — the
    decode operator must fail those cleanly."""
    a = {"audio_id": [], "payload": [], "sample_rate": [], "n_samples": [],
         "rms": [], "zcr": []}
    for i in range(120):
        payload, rate, n, rms, zcr = fixtures.synth_wav_bytes(i)
        a["audio_id"].append(i)
        a["payload"].append(payload)
        a["sample_rate"].append(rate)
        a["n_samples"].append(n)
        a["rms"].append(rms)
        a["zcr"].append(zcr)
    write(
        "audio.parquet",
        pa.table(
            {
                "audio_id": pa.array(a["audio_id"], pa.int64()),
                "payload": pa.array(a["payload"], pa.binary()),
                "sample_rate": pa.array(a["sample_rate"], pa.int32()),
                "n_samples": pa.array(a["n_samples"], pa.int64()),
                "rms": pa.array(a["rms"], pa.float64()),
                "zcr": pa.array(a["zcr"], pa.int64()),
            }
        ),
    )


def make_model_golden(artifact: str = "clf_v2.json",
                      out_name: str = "golden_extracted_model.parquet") -> None:
    """golden for the model-enabled pipeline: oracle + frozen artifact; run
    AFTER jobs/fit_artifacts.py. clf_v2 -> v1.1.0 golden; clf_v3_hi ->
    v1.2.0 golden (high-alpha mp variant whose decisions DIFFER from v2,
    so the golden discriminates the message-passing stage)."""
    art_path = os.path.join(os.path.dirname(OUT), "artifacts", artifact)
    if not os.path.exists(art_path):
        print(f"skip model golden: artifacts/{artifact} missing (run fit_artifacts)")
        return
    model = orc.load_model(art_path)
    rows = fixtures.gen_rows(N_PAGES)
    latest: dict[str, dict] = {}
    for r in rows:
        if r["url"] not in latest or r["warc_ts"] > latest[r["url"]]["warc_ts"]:
            latest[r["url"]] = r
    urls, texts, nbs = [], [], []
    for url in sorted(latest):
        o = orc.extract_page(url, latest[url]["html"], model)
        urls.append(url)
        texts.append(o["extracted_text"].encode("utf-8"))
        nbs.append(o["n_blocks"])
    write(
        out_name,
        pa.table(
            {
                "url": urls,
                "extracted_text": pa.array(texts, pa.binary()),
                "n_blocks": pa.array(nbs, pa.int32()),
            }
        ),
    )


def make_idf_table() -> None:
    """idf.parquet: the clf_v2 frozen IDF table as (token, idf) — the
    broadcast-join side for fn_tfidf_vec and its DuckDB oracle."""
    art_path = os.path.join(os.path.dirname(OUT), "artifacts", "clf_v2.json")
    if not os.path.exists(art_path):
        print("skip idf table: artifacts/clf_v2.json missing")
        return
    import json

    with open(art_path) as f:
        art = json.load(f)
    toks = sorted(art["idf"])
    write(
        "idf.parquet",
        pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "idf": pa.array([float(art["idf"][t]) for t in toks], pa.float64()),
            }
        ),
    )
    print(f"wrote idf.parquet: {len(toks)} tokens (idf_oov={art['idf_oov']})")


def make_images_px() -> None:
    """images_px.parquet: FULLY-DECODABLE PNG payloads with generator-truth
    pixel stats (px_sha fingerprints every decoded byte). Every 13th payload
    is truncated inside IDAT with null truth — the decode operator must fail
    those cleanly."""
    a = {"img_id": [], "payload": [], "width": [], "height": [],
         "channels": [], "px_mean": [], "px_sha": []}
    for i in range(120):
        payload, w, h, ch, mean, sha = fixtures.synth_png_pixels_bytes(i)
        a["img_id"].append(i)
        a["payload"].append(payload)
        a["width"].append(w)
        a["height"].append(h)
        a["channels"].append(ch)
        a["px_mean"].append(mean)
        a["px_sha"].append(sha)
    write(
        "images_px.parquet",
        pa.table(
            {
                "img_id": pa.array(a["img_id"], pa.int64()),
                "payload": pa.array(a["payload"], pa.binary()),
                "width": pa.array(a["width"], pa.int32()),
                "height": pa.array(a["height"], pa.int32()),
                "channels": pa.array(a["channels"], pa.int32()),
                "px_mean": pa.array(a["px_mean"], pa.float64()),
                "px_sha": pa.array(a["px_sha"], pa.string()),
            }
        ),
    )


def make_images_gif() -> None:
    """images_gif.parquet: FULLY-DECODABLE GIF payloads (real LZW streams;
    interlaced every third, local color table on odd ids) with
    generator-truth RGB pixel stats. Every 13th payload is truncated with
    null truth — the decode operator must fail those cleanly."""
    a = {"img_id": [], "payload": [], "width": [], "height": [],
         "channels": [], "px_mean": [], "px_sha": []}
    for i in range(120):
        payload, w, h, ch, mean, sha = fixtures.synth_gif_pixels_bytes(i)
        a["img_id"].append(i)
        a["payload"].append(payload)
        a["width"].append(w)
        a["height"].append(h)
        a["channels"].append(ch)
        a["px_mean"].append(mean)
        a["px_sha"].append(sha)
    write(
        "images_gif.parquet",
        pa.table(
            {
                "img_id": pa.array(a["img_id"], pa.int64()),
                "payload": pa.array(a["payload"], pa.binary()),
                "width": pa.array(a["width"], pa.int32()),
                "height": pa.array(a["height"], pa.int32()),
                "channels": pa.array(a["channels"], pa.int32()),
                "px_mean": pa.array(a["px_mean"], pa.float64()),
                "px_sha": pa.array(a["px_sha"], pa.string()),
            }
        ),
    )


def make_images_jpeg() -> None:
    """images_jpeg.parquet: FULLY-DECODABLE baseline JPEG payloads (real
    entropy-coded scans: canonical DHT tables, byte stuffing, restart
    markers on id%5==2, gray and YCbCr 4:4:4, non-multiple-of-8 dims) with
    generator-truth RECONSTRUCTION stats under the pinned IDCT/color
    recipe. Every 13th payload is truncated inside the scan with null
    truth — the decode operator must fail those cleanly."""
    a = {"img_id": [], "payload": [], "width": [], "height": [],
         "channels": [], "px_mean": [], "px_sha": []}
    for i in range(120):
        payload, w, h, ch, mean, sha = fixtures.synth_jpeg_bytes(i)
        a["img_id"].append(i)
        a["payload"].append(payload)
        a["width"].append(w)
        a["height"].append(h)
        a["channels"].append(ch)
        a["px_mean"].append(mean)
        a["px_sha"].append(sha)
    write(
        "images_jpeg.parquet",
        pa.table(
            {
                "img_id": pa.array(a["img_id"], pa.int64()),
                "payload": pa.array(a["payload"], pa.binary()),
                "width": pa.array(a["width"], pa.int32()),
                "height": pa.array(a["height"], pa.int32()),
                "channels": pa.array(a["channels"], pa.int32()),
                "px_mean": pa.array(a["px_mean"], pa.float64()),
                "px_sha": pa.array(a["px_sha"], pa.string()),
            }
        ),
    )


def make_videos() -> None:
    """videos.parquet: ISO-BMFF (MP4) containers with generator-truth
    metadata (brand, duration, video-track dims, track count; audio trak
    first on odd ids, 64-bit largesize mdat every 4th, mvhd/tkhd v0/v1
    alternating). Every 13th payload is truncated inside moov with null
    truth — the parse operator must fail those cleanly."""
    a = {"vid_id": [], "payload": [], "brand": [], "duration_ms": [],
         "width": [], "height": [], "n_tracks": []}
    for i in range(120):
        payload, brand, dur, w, h, nt = fixtures.synth_mp4_bytes(i)
        a["vid_id"].append(i)
        a["payload"].append(payload)
        a["brand"].append(brand)
        a["duration_ms"].append(dur)
        a["width"].append(w)
        a["height"].append(h)
        a["n_tracks"].append(nt)
    write(
        "videos.parquet",
        pa.table(
            {
                "vid_id": pa.array(a["vid_id"], pa.int64()),
                "payload": pa.array(a["payload"], pa.binary()),
                "brand": pa.array(a["brand"], pa.string()),
                "duration_ms": pa.array(a["duration_ms"], pa.float64()),
                "width": pa.array(a["width"], pa.int32()),
                "height": pa.array(a["height"], pa.int32()),
                "n_tracks": pa.array(a["n_tracks"], pa.int32()),
            }
        ),
    )


def make_avis() -> None:
    """videos_avi.parquet: RIFF/AVI containers whose '00dc' chunks are
    complete baseline JPEGs (MJPEG) with generator-truth PER-FRAME
    reconstruction stats — the video PIXEL decode path. Every 11th
    payload is truncated inside movi with all-null truth: the decoder
    must reject the whole container, never emit the frames before the
    cut."""
    a = {"vid_id": [], "payload": [], "width": [], "height": [],
         "fps": [], "n_frames": [], "channels": [], "frame_means": [],
         "frame_shas": []}
    for i in range(80):
        payload, w, h, fps, nf, nc, means, shas = fixtures.synth_avi_bytes(i)
        a["vid_id"].append(i)
        a["payload"].append(payload)
        a["width"].append(w)
        a["height"].append(h)
        a["fps"].append(fps)
        a["n_frames"].append(nf)
        a["channels"].append(nc)
        a["frame_means"].append(means)
        a["frame_shas"].append(shas)
    write(
        "videos_avi.parquet",
        pa.table(
            {
                "vid_id": pa.array(a["vid_id"], pa.int64()),
                "payload": pa.array(a["payload"], pa.binary()),
                "width": pa.array(a["width"], pa.int32()),
                "height": pa.array(a["height"], pa.int32()),
                "fps": pa.array(a["fps"], pa.float64()),
                "n_frames": pa.array(a["n_frames"], pa.int32()),
                "channels": pa.array(a["channels"], pa.int32()),
                "frame_means": pa.array(a["frame_means"],
                                        pa.list_(pa.float64())),
                "frame_shas": pa.array(a["frame_shas"],
                                       pa.list_(pa.string())),
            }
        ),
    )


def make_links() -> None:
    """Crawl link-graph fixture: edges from every distinct page url, with
    preferential host skew + nofollow flags (sparkdu.fixtures.gen_links)."""
    rows = fixtures.gen_rows(N_PAGES)
    urls = sorted({r["url"] for r in rows})
    edges = fixtures.gen_links(urls)
    write(
        "links.parquet",
        pa.table(
            {
                "src_url": [e[0] for e in edges],
                "dst_host": [e[1] for e in edges],
                "nofollow": pa.array([e[2] for e in edges], pa.bool_()),
            }
        ),
    )


def make_robots() -> None:
    """robots.txt fixture: one deterministic payload per link-graph host
    (sparkdu.fixtures.gen_robots), for the crawl-politeness decision join."""
    rows = fixtures.gen_robots()
    write(
        "robots.parquet",
        pa.table(
            {
                "host": [r[0] for r in rows],
                "robots": [r[1] for r in rows],
            }
        ),
    )


def make_sitemaps() -> None:
    """Sitemap fixture: per-host XML listing a third of the host's crawled
    urls (mixed fresh/stale/no-lastmod) plus 3 never-crawled urls."""
    rows = fixtures.gen_rows(N_PAGES)
    urls = sorted({r["url"] for r in rows})
    sm = fixtures.gen_sitemaps(urls)
    write(
        "sitemaps.parquet",
        pa.table(
            {
                "host": [s[0] for s in sm],
                "sitemap": [s[1] for s in sm],
            }
        ),
    )


def make_redirects() -> None:
    """Redirect-graph fixture: deterministic chains/cycles/fan-ins
    (sparkdu.fixtures.gen_redirects), for the pointer-doubling resolver."""
    rows = fixtures.gen_redirects()
    write(
        "redirects.parquet",
        pa.table(
            {
                "src_url": [r[0] for r in rows],
                "dst_url": [r[1] for r in rows],
                "status": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
    )


def make_pagexml() -> None:
    """pagexml.parquet + pagexml_nodes_truth.parquet: deterministic PAGE-XML
    documents (the upstream's native layout format) with generator-truth
    node rows. Every 11th payload is truncated with no truth rows — the
    fail-whole parse contract. Namespace alternates between two PAGE
    revision URIs; ReadingOrder indexes regions in reversed document order
    (see sparkdu/pagexml.py synth docstring)."""
    from sparkdu.pagexml import synth_pagexml_bytes

    docs = {"doc_id": [], "xml": []}
    truth = {k: [] for k in ("doc_id", "part_id", "node_id", "parent_id",
                             "kind", "rtype", "text", "ro_index",
                             "x1", "y1", "x2", "y2")}
    for i in range(90):
        payload, rows = synth_pagexml_bytes(i)
        docs["doc_id"].append(i)
        docs["xml"].append(payload)
        for n in rows:
            truth["doc_id"].append(i)
            for k in n:
                truth[k].append(n[k])
    write(
        "pagexml.parquet",
        pa.table(
            {
                "doc_id": pa.array(docs["doc_id"], pa.int64()),
                "xml": pa.array(docs["xml"], pa.binary()),
            }
        ),
    )
    write(
        "pagexml_nodes_truth.parquet",
        pa.table(
            {
                "doc_id": pa.array(truth["doc_id"], pa.int64()),
                "part_id": pa.array(truth["part_id"], pa.int32()),
                "node_id": pa.array(truth["node_id"], pa.int32()),
                "parent_id": pa.array(truth["parent_id"], pa.int32()),
                "kind": pa.array(truth["kind"], pa.string()),
                "rtype": pa.array(truth["rtype"], pa.string()),
                "text": pa.array(truth["text"], pa.string()),
                "ro_index": pa.array(truth["ro_index"], pa.int32()),
                "x1": pa.array(truth["x1"], pa.float64()),
                "y1": pa.array(truth["y1"], pa.float64()),
                "x2": pa.array(truth["x2"], pa.float64()),
                "y2": pa.array(truth["y2"], pa.float64()),
            }
        ),
    )



def make_pdf() -> None:
    """pdf.parquet + pdf_runs_truth.parquet: deterministic born-digital
    PDFs (classic xref, shuffled body order, raw + FlateDecode streams,
    indirect /Length, /Contents arrays, inherited /MediaBox page trees)
    with generator-truth text-run rows. Every 11th payload is truncated
    with no truth rows — the fail-whole parse contract (see
    sparkdu/pdf.py synth docstring)."""
    from sparkdu.pdf import synth_pdf_bytes

    docs = {"doc_id": [], "pdf": []}
    truth = {k: [] for k in ("doc_id", "part_id", "run_id", "page_w",
                             "page_h", "x", "y", "size", "text")}
    for i in range(90):
        payload, rows = synth_pdf_bytes(i)
        docs["doc_id"].append(i)
        docs["pdf"].append(payload)
        for r in rows:
            truth["doc_id"].append(i)
            for k in r:
                truth[k].append(r[k])
    write(
        "pdf.parquet",
        pa.table(
            {
                "doc_id": pa.array(docs["doc_id"], pa.int64()),
                "pdf": pa.array(docs["pdf"], pa.binary()),
            }
        ),
    )
    write(
        "pdf_runs_truth.parquet",
        pa.table(
            {
                "doc_id": pa.array(truth["doc_id"], pa.int64()),
                "part_id": pa.array(truth["part_id"], pa.int32()),
                "run_id": pa.array(truth["run_id"], pa.int32()),
                "page_w": pa.array(truth["page_w"], pa.float64()),
                "page_h": pa.array(truth["page_h"], pa.float64()),
                "x": pa.array(truth["x"], pa.float64()),
                "y": pa.array(truth["y"], pa.float64()),
                "size": pa.array(truth["size"], pa.float64()),
                "text": pa.array(truth["text"], pa.string()),
            }
        ),
    )


def make_pdf15() -> None:
    """pdf15.parquet: the SAME 90 logical documents as pdf.parquet,
    assembled as PDF 1.5 — cross-reference streams (with PNG-predictor
    /DecodeParms), non-stream objects packed into an object stream,
    /Index subsection splits, and /Prev-chained incremental updates on
    every 6th doc. No separate truth file: synth_pdf15_bytes returns
    truth IDENTICAL to the classic leg's, so pdf_runs_truth.parquet is
    the oracle for both (asserted here at generation time)."""
    from sparkdu.pdf import synth_pdf15_bytes, synth_pdf_bytes

    docs = {"doc_id": [], "pdf": []}
    for i in range(90):
        payload, rows = synth_pdf15_bytes(i)
        assert rows == synth_pdf_bytes(i)[1], f"truth drift at doc {i}"
        docs["doc_id"].append(i)
        docs["pdf"].append(payload)
    write(
        "pdf15.parquet",
        pa.table(
            {
                "doc_id": pa.array(docs["doc_id"], pa.int64()),
                "pdf": pa.array(docs["pdf"], pa.binary()),
            }
        ),
    )


def make_warc() -> None:
    """warc.parquet + warc_records_truth.parquet: deterministic REAL
    WARC/1.0 shards (ISO 28500 — warcinfo/request/response records,
    case-varied header names, HTTP response payloads mixing 200 text/html
    with 404/301/text-plain, every 7th shard member-gzipped like actual
    Common-Crawl output) with generator-truth record rows. Every 9th
    shard is truncated mid-record with no truth — fail-whole per shard
    (see sparkdu/warc.py)."""
    from sparkdu.warc import synth_warc_bytes

    docs = {"shard_id": [], "payload": []}
    truth = {k: [] for k in ("shard_id", "rec_idx", "rec_type", "url",
                             "warc_date", "status", "mime", "n_body",
                             "body_sha", "offset", "length")}
    for i in range(80):
        payload, rows = synth_warc_bytes(i)
        docs["shard_id"].append(i)
        docs["payload"].append(payload)
        for r in rows:
            truth["shard_id"].append(i)
            for k in r:
                truth[k].append(r[k])
    write(
        "warc.parquet",
        pa.table(
            {
                "shard_id": pa.array(docs["shard_id"], pa.int64()),
                "payload": pa.array(docs["payload"], pa.binary()),
            }
        ),
    )
    write(
        "warc_records_truth.parquet",
        pa.table(
            {
                "shard_id": pa.array(truth["shard_id"], pa.int64()),
                "rec_idx": pa.array(truth["rec_idx"], pa.int32()),
                "rec_type": pa.array(truth["rec_type"], pa.string()),
                "url": pa.array(truth["url"], pa.string()),
                "warc_date": pa.array(truth["warc_date"], pa.string()),
                "status": pa.array(truth["status"], pa.int32()),
                "mime": pa.array(truth["mime"], pa.string()),
                "n_body": pa.array(truth["n_body"], pa.int32()),
                "body_sha": pa.array(truth["body_sha"], pa.string()),
                "offset": pa.array(truth["offset"], pa.int64()),
                "length": pa.array(truth["length"], pa.int32()),
            }
        ),
    )


def make_table_cells() -> None:
    """table_cells.parquet: deterministic table-layout fixtures for the
    2-D grid-recovery operator (the upstream's table-understanding task:
    assign row/col indices to cell boxes from geometry alone). Per doc, a
    ragged grid (3-8 rows x 2-6 cols, per-row heights and per-col widths
    varying independently), jittered cell insets (0-2 px), ~10% of cells
    missing (sparse tables) — inter-row/col gaps are 6-14 px, so interval
    islands at threshold 3 must recover the exact grid. true_row/true_col
    are generator truth, 0-based top-to-bottom / left-to-right."""
    rng = random.Random(42_424_242)
    cols = {k: [] for k in ("doc_id", "cell_id", "x1", "y1", "x2", "y2",
                            "true_row", "true_col")}
    for did in range(120):
        n_rows, n_cols = rng.randint(3, 8), rng.randint(2, 6)
        heights = [rng.randint(28, 80) for _ in range(n_rows)]
        widths = [rng.randint(60, 220) for _ in range(n_cols)]
        rgaps = [rng.randint(6, 14) for _ in range(n_rows)]
        cgaps = [rng.randint(6, 14) for _ in range(n_cols)]
        y = float(rng.randint(40, 120))
        cid = 0
        ys = []
        for r in range(n_rows):
            ys.append(y)
            y += heights[r] + rgaps[r]
        xs = []
        x = float(rng.randint(30, 90))
        for c in range(n_cols):
            xs.append(x)
            x += widths[c] + cgaps[c]
        for r in range(n_rows):
            for c in range(n_cols):
                if rng.random() < 0.10 and not (r == 0 or c == 0):
                    continue  # sparse cell (keep row 0/col 0 complete)
                i1, i2 = rng.uniform(0, 2), rng.uniform(0, 2)
                cols["doc_id"].append(did)
                cols["cell_id"].append(cid)
                cols["x1"].append(round(xs[c] + i1, 1))
                cols["y1"].append(round(ys[r] + i2, 1))
                cols["x2"].append(round(xs[c] + widths[c] - rng.uniform(0, 2), 1))
                cols["y2"].append(round(ys[r] + heights[r] - rng.uniform(0, 2), 1))
                cols["true_row"].append(r)
                cols["true_col"].append(c)
                cid += 1
    write(
        "table_cells.parquet",
        pa.table(
            {
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "cell_id": pa.array(cols["cell_id"], pa.int32()),
                "x1": pa.array(cols["x1"], pa.float64()),
                "y1": pa.array(cols["y1"], pa.float64()),
                "x2": pa.array(cols["x2"], pa.float64()),
                "y2": pa.array(cols["y2"], pa.float64()),
                "true_row": pa.array(cols["true_row"], pa.int32()),
                "true_col": pa.array(cols["true_col"], pa.int32()),
            }
        ),
    )


def make_table_span_cells() -> None:
    """table_span_cells.parquet: table layouts WITH merged cells (row/col
    spans), the shape real ABP-style tables exhibit and where plain
    interval islands fail by design (a spanning cell bridges the gap its
    covered rows leave). ~15% of eligible cells span 2 rows or 2 cols
    (absorbing the covered neighbor). Column 0 and row 0 never span, so
    every row band has an unspanned start cell and every col band an
    unspanned left edge — the anchor-band recovery precondition, planted
    deliberately and documented. Truth: row_start/row_end/col_start/
    col_end (0-based, inclusive)."""
    rng = random.Random(777_777)
    cols = {k: [] for k in ("doc_id", "cell_id", "x1", "y1", "x2", "y2",
                            "row_start", "row_end", "col_start", "col_end")}
    for did in range(100):
        n_rows, n_cols = rng.randint(3, 7), rng.randint(3, 6)
        heights = [rng.randint(28, 80) for _ in range(n_rows)]
        widths = [rng.randint(60, 220) for _ in range(n_cols)]
        rgap, cgap = rng.randint(6, 14), rng.randint(6, 14)
        ys, y = [], float(rng.randint(40, 120))
        for r in range(n_rows):
            ys.append(y)
            y += heights[r] + rgap
        xs, x = [], float(rng.randint(30, 90))
        for c in range(n_cols):
            xs.append(x)
            x += widths[c] + cgap
        taken = [[False] * n_cols for _ in range(n_rows)]
        cid = 0
        for r in range(n_rows):
            for c in range(n_cols):
                if taken[r][c]:
                    continue
                rs = re_ = r
                cs = ce = c
                if r > 0 and c > 0 and rng.random() < 0.15:
                    if (rng.random() < 0.5 and r + 1 < n_rows
                            and not taken[r + 1][c]):
                        re_ = r + 1
                    elif c + 1 < n_cols and not taken[r][c + 1]:
                        ce = c + 1
                for rr in range(rs, re_ + 1):
                    for cc in range(cs, ce + 1):
                        taken[rr][cc] = True
                i = rng.uniform(0, 2)
                cols["doc_id"].append(did)
                cols["cell_id"].append(cid)
                cols["x1"].append(round(xs[cs] + i, 1))
                cols["y1"].append(round(ys[rs] + rng.uniform(0, 2), 1))
                cols["x2"].append(round(
                    xs[ce] + widths[ce] - rng.uniform(0, 2), 1))
                cols["y2"].append(round(
                    ys[re_] + heights[re_] - rng.uniform(0, 2), 1))
                cols["row_start"].append(rs)
                cols["row_end"].append(re_)
                cols["col_start"].append(cs)
                cols["col_end"].append(ce)
                cid += 1
    write(
        "table_span_cells.parquet",
        pa.table(
            {
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "cell_id": pa.array(cols["cell_id"], pa.int32()),
                "x1": pa.array(cols["x1"], pa.float64()),
                "y1": pa.array(cols["y1"], pa.float64()),
                "x2": pa.array(cols["x2"], pa.float64()),
                "y2": pa.array(cols["y2"], pa.float64()),
                "row_start": pa.array(cols["row_start"], pa.int32()),
                "row_end": pa.array(cols["row_end"], pa.int32()),
                "col_start": pa.array(cols["col_start"], pa.int32()),
                "col_end": pa.array(cols["col_end"], pa.int32()),
            }
        ),
    )


def make_pages_meta() -> None:
    """Head-metadata fixture: deterministic pages with messy <head> markup
    (sparkdu.fixtures.gen_head_meta), for the extract_doc_meta key."""
    rows = fixtures.gen_head_meta()
    write(
        "pages_meta.parquet",
        pa.table(
            {
                "url": [r[0] for r in rows],
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        ),
    )


def regenerate_all() -> None:
    """The single documented regeneration entry point: produces EVERY
    committed fixture. New generators must be appended HERE (the only
    __main__ block is at the end of the file, after all defs, so nothing
    can be defined 'below main' and silently skipped)."""
    main()
    make_edges()
    make_audio()
    make_images_px()
    make_images_gif()
    make_images_jpeg()
    make_videos()
    make_avis()
    make_model_golden()
    make_model_golden("clf_v3_hi.json", "golden_extracted_model_v3.parquet")
    make_idf_table()
    make_links()
    make_robots()
    make_redirects()
    make_sitemaps()
    make_pagexml()
    make_pdf()
    make_pdf15()
    make_warc()
    make_table_cells()
    make_table_span_cells()
    make_pages_meta()


if __name__ == "__main__":
    regenerate_all()
