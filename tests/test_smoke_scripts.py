"""Run the synthetic smoke scripts end-to-end (VERDICT r1 weak #8).

The reference's entire test surface is 8 smoke scripts (`--batch_size 1
--debug`, SURVEY §4); ours mirror them under `smoke/`. Only the two synthetic
configs are runnable without RDKit/network — wire exactly those into CI, on
CPU (EQUIHGNN_TPU_PLATFORM=cpu) so the suite never touches the TPU tunnel.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", ["run_synthetic.sh", "run_synthetic_3d.sh"])
def test_synthetic_smoke_script(script, tmp_path):
    env = dict(os.environ)
    env["EQUIHGNN_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("XLA_FLAGS", "")  # no virtual mesh needed; single CPU device
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "smoke", script), "0"],
        cwd=str(tmp_path),  # logs/ + datasets/ land in the tmp dir
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "Task end time" in proc.stdout
    assert "test_mae_mean" in proc.stdout


def test_cli_data_parallel_smoke(tmp_path):
    """The CLI --data_parallel path end to end on a virtual 8-device mesh
    (flag → mesh build → shard_map step → DP eval all-gather → test CSV)."""
    env = dict(os.environ)
    env["EQUIHGNN_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [
            "python", "-m", "equihgnn_tpu.main",
            "--data", "synthetic_hg_3d", "--method", "mhnns",
            "--epochs", "1", "--batch_size", "16", "--debug",
            "--data_parallel", "--synthetic_size", "128",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "test_mae_mean" in proc.stdout
