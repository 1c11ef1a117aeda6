"""bench.py's child-process ladders (the per-round evidence chain).

The stdout/stderr line contracts are the driver artifact the judge
reads; these tests pin the retry/fallback/labeling behavior with a
mocked subprocess so a refactor cannot silently turn a lost compile
race back into an unlabeled 'timed out'."""
import importlib.util
import os
import subprocess
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _R:
    def __init__(self, stdout=""):
        self.stdout = stdout
        self.stderr = ""


def test_hetero_ladder_retries_then_labels(bench, monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        if len(calls) <= 2:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        return _R('{"metric": "m", "value": 1, "vs_baseline": 2}\n')

    monkeypatch.setattr(bench.subprocess if hasattr(bench, "subprocess")
                        else subprocess, "run", fake_run)
    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._hetero_stderr_line()
    err = capsys.readouterr().err
    # two lost rungs (nb=1024 x2), then the nb=512 fallback with a label
    assert "partial (nb=512 fallback)" in err
    assert '{"metric"' in err
    assert len(calls) == 3
    assert "--nblocks=1024" in " ".join(map(str, calls[0]))
    assert "--nblocks=512" in " ".join(map(str, calls[2]))


def test_hetero_ladder_total_loss_is_labeled(bench, monkeypatch, capsys):
    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._hetero_stderr_line()
    err = capsys.readouterr().err
    assert "no result" in err            # labeled, never silent


def test_sustained_ladder_retry_label(bench, monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        return _R('{"metric": "s", "value": 3, "vs_baseline": 4}\n')

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._sustained_stderr_line()
    err = capsys.readouterr().err
    assert "sustained: attempt timed out" in err
    assert "sustained: retry: {" in err
    assert all("--sustained" in " ".join(map(str, c)) for c in calls)
