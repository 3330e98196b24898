"""Driver-contract tests for bench.py and __graft_entry__.

The round-2 axon outage produced BENCH_r02.json rc=1 and MULTICHIP_r02.json
rc=124 because both entry points queried a hung default backend (VERDICT
round-2 weak #1/#3). These tests pin the hardened behavior:

  * bench.py's parent process never imports jax; on an unreachable backend it
    still ends with a contract JSON line ({"metric","value","unit",
    "vs_baseline"}) and exits 0.
  * the happy path re-emits the child's JSON verbatim as the last line.
  * dryrun_multichip never probes the default backend (source-level check;
    the full body runs in the driver's MULTICHIP artifact and in
    test_smoke_scripts-style runs).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


@pytest.mark.quick
def test_bench_smoke_contract_line(tmp_path):
    """Happy path on the CPU backend: probe OK -> child runs -> last stdout
    line is the contract JSON, rc=0, and the smoke run does not touch
    BENCH_LAST_GOOD.json."""
    before = open(os.path.join(REPO, "BENCH_LAST_GOOD.json")).read()
    r = _run_bench(
        {"JAX_PLATFORMS": "cpu", "EQUIHGNN_BENCH_SMOKE": "1"}, timeout=600
    )
    assert r.returncode == 0, r.stderr[-2000:]
    last = json.loads(r.stdout.strip().splitlines()[-1])
    assert last["metric"] == "qm9_synthetic_train_molecules_per_sec_per_chip"
    assert last["unit"] == "molecules/sec/chip"
    assert isinstance(last["value"], (int, float)) and last["value"] > 0
    assert "vs_baseline" in last
    assert open(os.path.join(REPO, "BENCH_LAST_GOOD.json")).read() == before


@pytest.mark.quick
def test_bench_diagnostic_line_carries_last_good():
    """The stale-fallback line satisfies the contract and carries the last
    good TPU value."""
    sys.path.insert(0, REPO)
    try:
        import bench

        line = bench._diagnostic_line("backend down (test)")
    finally:
        sys.path.remove(REPO)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in line
    assert line["stale"] is True
    assert line["error"] == "backend down (test)"
    assert line["value"] and line["value"] > 0  # seeded from round-2


@pytest.mark.quick
def test_dryrun_never_queries_default_backend():
    """dryrun_multichip must not call jax.devices()/jax.* before forcing the
    CPU platform in a subprocess: a bare devices() hung indefinitely during
    the round-2 outage. Source-level guard: the function body contains no
    jax import at all (the subprocess code string owns it)."""
    import ast
    import inspect

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    tree = ast.parse(inspect.getsource(g.dryrun_multichip))
    imports = [
        n.names[0].name
        for n in ast.walk(tree)
        if isinstance(n, (ast.Import, ast.ImportFrom))
    ]
    assert "jax" not in imports, (
        "dryrun_multichip imports jax in the parent process; during a "
        "backend outage that hangs before the CPU-subprocess fallback"
    )
