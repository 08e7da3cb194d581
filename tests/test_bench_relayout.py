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
        import os

        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(dst):
            dst = f"{dst}/*.parquet"
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


def test_relayout_splits_for_parallel_scans():
    import glob
    import os

    import pyarrow.parquet as pq

    out, _ = relayout(SF_DIR)
    # documents/embeddings become multi-file directories (one Spark split
    # per file); relational tables get 16k-row groups (multiple groups
    # whenever the table is big enough to matter)
    parts = glob.glob(f"{out}/documents.parquet/*.parquet")
    assert len(parts) > 1
    f = pq.ParquetFile(f"{out}/lineitem.parquet")
    n_rows = f.metadata.num_rows
    assert f.metadata.num_row_groups == max(1, -(-n_rows // 16384)) or (
        f.metadata.num_row_groups > 1
    )
    assert os.path.isfile(f"{out}/lineitem.parquet")
