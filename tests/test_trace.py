"""Tracer spans, counters, nesting, and report/json export."""
import json
import time

from cmvs_pmvs_tpu.utils.trace import Tracer


def test_spans_and_counters(tmp_path):
    tr = Tracer()
    with tr.trace():
        with tr.span("seed"):
            time.sleep(0.01)
        for _ in range(2):
            with tr.span("expand"):
                with tr.span("refine"):
                    pass
        tr.add_counter("seed", "patches", 5)
        tr.add_counter("expand", "accepted", 3)
        tr.add_counter("expand", "accepted", 4)
    rep = tr.report()
    assert rep["seed"]["seconds"] >= 0.01
    assert rep["seed"]["patches"] == 5
    assert rep["expand"]["count"] == 2
    assert rep["expand"]["accepted"] == 7
    assert "expand.refine" in rep          # nested dotted name
    path = str(tmp_path / "trace.json")
    tr.write(path)
    assert json.load(open(path))["seed"]["patches"] == 5
    assert "seed" in tr.summary()


def test_disabled_tracer_is_noop():
    tr = Tracer(enabled=False)
    with tr.span("x"):
        pass
    assert tr.report() == {}
