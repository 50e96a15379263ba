"""CLI end-to-end: the reference's main.go workflow on text files."""

from __future__ import annotations

import glob
import os

from map_reduce_in_go_spark.cli import main


def _read_all(path: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for f in glob.glob(os.path.join(path, "bucket=*", "*.csv")):
        with open(f) as fh:
            for line in fh:
                k, v = line.rstrip("\n").split("\t")
                assert k not in out, f"key {k} appears in two buckets"
                out[k] = int(v)
    return out


def test_cli_wordcount_native(tmp_path, spark):
    src = tmp_path / "in.txt"
    src.write_text("The fox. THE FOX!\nfox?\n")
    out = str(tmp_path / "out")
    assert main(["--input", str(src), "--output", out, "--reduce", "3"]) == 0
    assert _read_all(out) == {"the": 2, "fox": 3}


def test_cli_wordcount_generic_matches_native(tmp_path, spark):
    src = tmp_path / "in.txt"
    src.write_text("alpha beta beta Gamma; gamma GAMMA\n")
    out_n = str(tmp_path / "native")
    out_g = str(tmp_path / "generic")
    main(["--input", str(src), "--output", out_n, "--reduce", "2"])
    main(["--input", str(src), "--output", out_g, "--reduce", "2", "--generic"])
    assert _read_all(out_n) == _read_all(out_g) == {
        "alpha": 1,
        "beta": 2,
        "gamma": 3,
    }


def test_cli_grep(tmp_path, spark):
    a = tmp_path / "a.txt"
    a.write_text("spark line\nno match\nspark again\n")
    b = tmp_path / "b.txt"
    b.write_text("nothing here\n")
    out = str(tmp_path / "out")
    assert (
        main(["--input", f"{a},{b}", "--output", out, "--app", "grep",
              "--pattern", "spark", "--reduce", "2"])
        == 0
    )
    got = _read_all(out)
    assert len(got) == 1 and next(iter(got.values())) == 2

def test_cli_list_queries(capsys):
    from map_reduce_in_go_spark.cli import main

    assert main(["--list-queries"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "wordcount" in out and "pagerank_docs" in out and len(out) >= 100


def test_cli_run_query(tmp_path, spark, sf_dir, capsys):
    from map_reduce_in_go_spark.cli import main

    out = str(tmp_path / "q6")
    rc = main(["--run-query", "q6_forecast_revenue", "--sf-dir", sf_dir,
               "--output", out])
    assert rc == 0
    assert spark.read.parquet(out).count() == 1


def test_cli_run_query_unknown():
    from map_reduce_in_go_spark.cli import main

    assert main(["--run-query", "nope"]) == 2


def test_cli_signal_handler_drains_and_exits(spark):
    """main.go:32-66 parity: the installed SIGTERM handler stops active
    streaming queries, stops the session only when CLI-owned, and exits
    with 128+signum. Simulated: install against a stub session, retrieve
    the registered handler, and invoke it."""
    import signal

    from map_reduce_in_go_spark.cli import install_signal_handlers

    class StubQuery:
        def __init__(self):
            self.stopped = False

        def stop(self):
            self.stopped = True

    class StubStreams:
        def __init__(self, qs):
            self.active = qs

    class StubSession:
        def __init__(self):
            self.queries = [StubQuery(), StubQuery()]
            self.streams = StubStreams(self.queries)
            self.stopped = False

        def stop(self):
            self.stopped = True

    saved = {s: signal.getsignal(s) for s in (signal.SIGINT, signal.SIGTERM)}
    try:
        # not CLI-owned: queries drain, session left running
        stub = StubSession()
        install_signal_handlers(stub, owned=False)
        handler = signal.getsignal(signal.SIGTERM)
        try:
            handler(signal.SIGTERM, None)
        except SystemExit as e:
            assert e.code == 128 + signal.SIGTERM
        else:
            raise AssertionError("handler must exit")
        assert all(q.stopped for q in stub.queries)
        assert not stub.stopped

        # CLI-owned: session stopped too
        stub2 = StubSession()
        install_signal_handlers(stub2, owned=True)
        handler2 = signal.getsignal(signal.SIGINT)
        try:
            handler2(signal.SIGINT, None)
        except SystemExit as e:
            assert e.code == 128 + signal.SIGINT
        assert all(q.stopped for q in stub2.queries)
        assert stub2.stopped
    finally:
        for s, h in saved.items():
            signal.signal(s, h)


def test_dynamic_allocation_gated_to_cluster_masters():
    """Reference dynamic-worker-pool parity: the dynamicAllocation block
    is empty under every local master and populated for cluster URLs."""
    from map_reduce_in_go_spark.session import cluster_dynamic_allocation_conf

    assert cluster_dynamic_allocation_conf("local[32]") == {}
    assert cluster_dynamic_allocation_conf("local[*]") == {}
    for master in ("spark://host:7077", "yarn", "k8s://https://api:6443"):
        conf = cluster_dynamic_allocation_conf(master)
        assert conf["spark.dynamicAllocation.enabled"] == "true"
        assert conf["spark.dynamicAllocation.shuffleTracking.enabled"] == "true"
