"""Graph construction: the grouped sweep and the join form must agree
exactly (same SPEC edge semantics, two physical strategies — SURVEY SS2.3)."""

import pytest


@pytest.fixture(scope="module")
def geo(spark):
    from sparkdu.harness import f

    return f(spark, "geo").cache()


def _edges(df):
    return {
        (r["url"], r["src_node_id"], r["dst_node_id"], r["edge_type"]): (
            round(r["dist"], 9),
            round(r["overlap"], 9),
        )
        for r in df.collect()
    }


def test_sweep_equals_join_form(spark, geo):
    from sparkdu.graph import build_edges_grouped, build_edges_join

    sweep = _edges(build_edges_grouped(geo))
    join = _edges(build_edges_join(geo))
    assert set(sweep) == set(join)
    for k, v in sweep.items():
        assert v == join[k], k


def test_edges_match_committed_fixture(spark, geo):
    """The DuckDB-derived committed edges.parquet is a third independent
    computation of the same semantics."""
    from sparkdu.graph import build_edges_grouped
    from sparkdu.harness import f

    sweep = _edges(build_edges_grouped(geo))
    fixture = _edges(f(spark, "edges"))
    assert sweep == fixture


def test_neighbor_counts(spark, geo):
    from sparkdu.graph import build_edges_grouped, with_neighbor_counts

    edges = build_edges_grouped(geo)
    out = with_neighbor_counts(geo, edges)
    rows = out.collect()
    assert len(rows) == geo.count()
    tot = sum(r["n_h_neighbors"] + r["n_v_neighbors"] for r in rows)
    n_hv = edges.filter("edge_type != 'xpart'").count()
    assert tot == 2 * n_hv


def test_iceberg_ddl_renders():
    from sparkdu.tables import SCHEMAS, iceberg_ddl

    for name in SCHEMAS:
        ddl = iceberg_ddl(name)
        assert "USING iceberg" in ddl and name in ddl
    assert "days(warc_ts)" in iceberg_ddl("pages")
    assert "bucket(256, url)" in iceberg_ddl("nodes")


def test_table_catalog_roundtrip(spark, pages_df, tmp_path):
    from sparkdu.tables import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "warehouse"))
    assert not cat.exists("pages")
    cat.write("pages", pages_df, mode="overwrite")
    assert cat.exists("pages")
    back = cat.read("pages")
    assert back.count() == pages_df.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in pages_df.schema.fields]
