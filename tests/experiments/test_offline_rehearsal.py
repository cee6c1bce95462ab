"""The offline replication rehearsal stays runnable.

``replication_scripts/fetch_and_verify.sh`` is the replication-readiness
driver (reference replication_scripts/README.md + pretrained/*.sh): with
network it fetches the upstream release weights and runs the pretrained
evaluations; without it (this environment) it rehearses the exact same
code path — release-layout ``.pt`` -> ``restore_any`` ->
``import_torch_checkpoint`` -> evaluate — on synthesized fixtures. This
test pins the offline leg so the one-command closure of the replication
gap keeps working.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_offline_rehearsal_runs():
    repo = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    result = subprocess.run(
        [sys.executable,
         os.path.join(repo, "replication_scripts", "offline_rehearsal.py")],
        # The seg/voting leg evaluates test_shapenet.py's EXACT
        # RECIPE-pinned model (conv [64,128,256]) — its CPU compiles
        # run ~5-6 min alone on this 1-core host and longer under the
        # full gate's memory pressure (timed out at 900 there).
        capture_output=True, text=True, env=env, timeout=2400,
    )
    assert result.returncode == 0, (result.stdout[-2000:],
                                    result.stderr[-2000:])
    assert "offline rehearsal: OK" in result.stdout
    # Round-5: BOTH heads rehearse — classification --checkpoint eval
    # AND the seg 2-vote summed-logit evaluation (test_shapenet.py).
    assert "Instance mIoU" in result.stdout, result.stdout[-2000:]
    assert "voting eval path exercised" in result.stdout
