"""Multi-host execution evidence (VERDICT r3 item 1).

The reference vendored ``mpi_fork`` (UNI/utils/mpi_tools.py:6-36) but
never invoked it; our successor is ``jax.distributed`` multi-process
init behind ``--coordinator/--num_processes/--process_id``.  These tests
EXECUTE that path for real: a 2-process gang on a localhost coordinator
(CPU backend, Gloo collectives), running the actual CLI training program
data-parallel across the gang's global devices, with rank-0-only
artifact writes — then certify the gang's training numerics against an
in-process run of the SAME dp-2 program (isolating exactly the
process-topology dimension).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# minimal-but-real training knobs: updates must actually run (replay
# gate size > batch_size) so the cross-process gradient psums execute
_KNOBS = ["--max_episodes", "2", "--max_episode_steps", "6",
          "--batch_size", "4", "--start_steps", "2",
          "--replay_size", "512", "--quiet"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_dir(out: str) -> str:
    return os.path.join(out, "unicycle-run1", "Node_LBAC_Unicycle",
                        "Node_LBAC_Unicycle_s12345")


def _clean_env(**extra) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env.update(extra)
    return env


def _load_cols(out: str):
    from nlbac_tpu.utils.plot import load_progress
    return load_progress(os.path.join(_run_dir(out), "progress.txt"))


@pytest.mark.slow
def test_two_process_gang_dp_training(tmp_path):
    """A REAL 2-process ``jax.distributed.initialize`` gang executes the
    CLI training program dp-sharded over its global devices:

    - both ranks join (``jax.process_count()==2`` printed from the live
      backend, 2 global devices = 1 CPU device per process);
    - gradient psums cross process boundaries (Gloo) — updates run and
      the loss columns come out finite and nonzero;
    - ONLY rank 0 writes the run dir (progress/config/weights);
    - the gang's progress.txt matches an in-process run of the SAME
      dp=2 program (2 virtual devices, one process) to f32 tolerance —
      the only varied dimension is process topology.
    """
    port = _free_port()
    gang_out = str(tmp_path / "gang")
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "train.py", "--preset", "unicycle", "--cpu",
             "--dp", "2", "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid),
             "--output", gang_out] + _KNOBS,
            cwd=REPO, env=_clean_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
    # the banner prints the LIVE jax.process_count()/device_count()
    assert "rank=0/2 global_devices=2" in outs[0]
    assert "rank=1/2 global_devices=2" in outs[1]
    # rank-0-only artifacts
    run = _run_dir(gang_out)
    for f in ("progress.txt", "config.json", "actor.pkl", "critic.pkl"):
        assert os.path.exists(os.path.join(run, f)), f
    assert "-> None" in outs[1]  # rank 1 got no output dir

    cols = _load_cols(gang_out)
    assert len(cols["Episode"]) == 2
    assert cols["updates"][-1] > 0  # the dp update program really ran
    assert np.isfinite(cols["qf1_loss"]).all() and cols["qf1_loss"][-1] != 0

    # in-process reference: SAME dp=2 program on 2 virtual devices
    ref_out = str(tmp_path / "ref")
    ref = subprocess.run(
        [sys.executable, "train.py", "--preset", "unicycle", "--cpu",
         "--dp", "2", "--output", ref_out] + _KNOBS,
        cwd=REPO, capture_output=True, text=True, timeout=900,
        env=_clean_env(XLA_FLAGS="--xla_force_host_platform_device_count=2"))
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-2000:]
    ref_cols = _load_cols(ref_out)
    for k in ("reward_train", "qf1_loss", "qf2_loss", "lf_loss",
              "policy_loss", "episode_steps", "updates"):
        np.testing.assert_allclose(
            cols[k], ref_cols[k], rtol=2e-4, atol=1e-5,
            err_msg=f"gang vs in-process dp=2 diverged on {k}")


def test_gang_invalid_combo_fails_before_joining():
    """An invalid flag combination must exit loudly BEFORE
    jax.distributed.initialize blocks waiting for the gang (a hung
    process would stall the whole launch)."""
    r = subprocess.run(
        [sys.executable, "train.py", "--preset", "unicycle", "--cpu",
         "--coordinator", "localhost:1", "--num_processes", "2",
         "--process_id", "0", "--n_seeds", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
        env=_clean_env())
    assert r.returncode != 0
    assert "n_seeds" in (r.stdout + r.stderr)
