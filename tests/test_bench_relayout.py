"""bench.py's relayout step must be a pure physical-layout change: same
rows, same values, same logical column types — only row-group structure
differs. Runs entirely in DuckDB (no Spark session)."""

import duckdb

from bench import relayout

SF_DIR = "/root/testdata/sf0.001"


def test_relayout_preserves_content():
    out, _ = relayout(SF_DIR)
    con = duckdb.connect()
    for t in (
        "region",
        "nation",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        src, dst = f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet"
        n_src, n_dst = (
            con.execute(
                f"SELECT (SELECT count(*) FROM read_parquet('{src}')),"
                f" (SELECT count(*) FROM read_parquet('{dst}'))"
            ).fetchone()
        )
        assert n_src == n_dst, t
        # order-insensitive full-content check
        diff = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT * FROM read_parquet('{src}') EXCEPT ALL"
            f" SELECT * FROM read_parquet('{dst}'))"
            f" UNION ALL "
            f"(SELECT * FROM read_parquet('{dst}') EXCEPT ALL"
            f" SELECT * FROM read_parquet('{src}')))"
        ).fetchone()[0]
        assert diff == 0, t
        types_src = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()
        types_dst = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{dst}')"
        ).fetchall()
        assert types_src == types_dst, t


def test_relayout_splits_row_groups():
    import pyarrow.parquet as pq

    out, _ = relayout(SF_DIR)
    f = pq.ParquetFile(f"{out}/lineitem.parquet")
    assert f.metadata.num_row_groups > 1
