"""Observability helpers: progress gating, timed rates, profiler no-op."""

import io

from fastsk_tpu.utils.observe import (
    Progress,
    enable_compilation_cache,
    profiler_trace,
    timed,
)


def test_progress_quiet_gating():
    buf = io.StringIO()
    Progress(quiet=True, stream=buf).log("hidden")
    assert buf.getvalue() == ""
    buf2 = io.StringIO()
    Progress(quiet=False, stream=buf2).log("shown")
    out = buf2.getvalue()
    assert "shown" in out and out.startswith("[fastsk +")


def test_timed_reports_wall_and_rate():
    buf = io.StringIO()
    p = Progress(quiet=False, stream=buf)
    with timed(p, "span", work_items=100, unit="pairs") as info:
        pass
    assert info["wall_s"] >= 0
    assert info["rate"] > 0
    assert "pairs/s" in buf.getvalue()


def test_profiler_trace_noop_without_dir():
    with profiler_trace(None):
        x = 1
    assert x == 1


def test_enable_compilation_cache_env_disable(monkeypatch, tmp_path):
    monkeypatch.setenv("FASTSK_COMPILATION_CACHE", "0")
    assert enable_compilation_cache() == ""
    monkeypatch.setenv("FASTSK_COMPILATION_CACHE", str(tmp_path / "cc"))
    got = enable_compilation_cache()
    assert got == str(tmp_path / "cc")
