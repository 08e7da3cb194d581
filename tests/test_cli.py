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
