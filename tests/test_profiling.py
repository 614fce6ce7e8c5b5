"""utils/profiling: the phase-timer registry behind every run's timing
report (the observability subsystem the reference lacks — SURVEY §5)."""

import logging

from merizo_search_tpu.utils import profiling


def setup_function(_fn):
    profiling.reset()


def test_phase_accumulates_time_and_calls():
    with profiling.phase("scan"):
        pass
    with profiling.phase("scan"):
        pass
    with profiling.phase("rescore"):
        pass
    t = profiling.timings()
    assert t["scan"][1] == 2
    assert t["rescore"][1] == 1
    assert t["scan"][0] >= 0.0


def test_phase_records_on_exception():
    try:
        with profiling.phase("broken"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert profiling.timings()["broken"][1] == 1


def test_report_renders_sorted_table(caplog):
    with profiling.phase("b"):
        pass
    with profiling.phase("a"):
        pass
    log = logging.getLogger("test_profiling")
    with caplog.at_level(logging.INFO, logger="test_profiling"):
        text = profiling.report(log=log)
    assert text.startswith("phase timings:")
    assert "a" in text and "b" in text
    assert any("phase timings:" in r.message for r in caplog.records)


def test_report_empty_registry_is_quiet():
    assert profiling.report() == ""


def test_trace_noop_without_dir():
    with profiling.trace(None):
        x = 1
    assert x == 1
