"""tools/accept_real.py --dry-run is part of the test suite (VERDICT r3
item 6): the turnkey real-data acceptance script is the one artifact that
must work at first contact with TextZoom LMDBs + published checkpoints, so
its plumbing (checkpoint import reporting, the --go_test flow through
TextSR._run_val, the acceptance table, --json output) is exercised end-to-end
here on synthetic data — any drift in the trainer surface it calls breaks
this test instead of rotting silently.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLITS = ("easy", "medium", "hard")


def _clean_env() -> dict:
    """Subprocess env: plain single-device CPU (the --cpu flag forces the
    backend; the forced 8-device flag from conftest would otherwise leak)."""
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


@pytest.fixture(scope="module")
def dry_run_result(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from tests.torch_mirror import build_torch_crnn

    tmp = tmp_path_factory.mktemp("accept_dry")
    crnn_path = str(tmp / "crnn.pth")
    torch.save(build_torch_crnn().state_dict(), crnn_path)
    json_path = str(tmp / "metrics.json")

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "accept_real.py"),
            "--dry-run",
            "--cpu",
            "--crnn",
            crnn_path,
            "--json",
            json_path,
        ],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    return proc, json_path


def test_dry_run_exits_zero(dry_run_result):
    proc, _ = dry_run_result
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"


def test_dry_run_import_lines(dry_run_result):
    """Every checkpoint-import line reports [ok] or [skip] — a [FAIL] means
    an importer crashed on a valid state_dict (or a given path was bad)."""
    proc, _ = dry_run_result
    out = proc.stdout
    assert "checkpoint imports:" in out
    assert "[ok]   crnn" in out  # real import through torch_import.import_crnn
    assert "[skip] aster" in out
    assert "[skip] moran" in out
    assert "[FAIL]" not in out
    assert "[info] generator: none given" in out


def test_dry_run_acceptance_table(dry_run_result):
    proc, _ = dry_run_result
    out = proc.stdout
    assert "=== acceptance table (accuracy on SR output) ===" in out
    # the CRNN row carries the paper targets next to each split
    crnn_rows = [l for l in out.splitlines() if l.startswith("crnn")]
    assert crnn_rows and "paper" in crnn_rows[0]
    assert "psnr/ssim" in out


def test_dry_run_json_schema(dry_run_result):
    proc, json_path = dry_run_result
    assert os.path.exists(json_path), proc.stdout
    with open(json_path) as f:
        data = json.load(f)
    assert set(data) == {"crnn"}
    for s in SPLITS:
        md = data["crnn"][s]
        for k in ("accuracy", "psnr_avg", "ssim_avg", "images"):
            assert k in md, (s, sorted(md))
            assert isinstance(md[k], (int, float))
        assert 0.0 <= md["accuracy"] <= 1.0
        assert md["images"] == 6  # the dry-run builds 6-sample splits
