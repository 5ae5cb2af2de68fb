"""Full CLI integration: disk dataset -> train -> snapshot -> eval.

Slow (~10 min on CPU: renders a real LineMOD-format fixture and runs two
training rounds), so gated behind P3D_SLOW_TESTS=1.  The same flow is what
`.claude/skills/verify` drives manually.
"""

import os
import subprocess
import sys

import pytest

SLOW = os.environ.get("P3D_SLOW_TESTS") == "1"


@pytest.mark.skipif(not SLOW, reason="set P3D_SLOW_TESTS=1 to run")
def test_cli_train_then_eval(tmp_path):
    from make_disk_fixture import make_linemod_fixture, write_fixture_config

    root = tmp_path / "data"
    make_linemod_fixture(str(root))
    cfgp = tmp_path / "config.ini"
    write_fixture_config(str(cfgp), str(root), str(tmp_path / "h5"),
                         str(tmp_path / "out"))

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    r = subprocess.run([sys.executable, "-m", "pose3d_tpu.cli", "train",
                        str(cfgp)], env=env, capture_output=True, text=True,
                       timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "out"
    assert (out / "logfixture.txt").exists()
    assert (out / "cmfixture.txt").exists()
    assert any(f.endswith(".ckpt") for f in os.listdir(out))

    header = open(out / "logfixture.txt").readline().split("\t")
    assert header[:4] == ["mod", "iter", "epoch", "time"]

    r = subprocess.run([sys.executable, "-m", "pose3d_tpu.cli", "eval",
                        str(cfgp)], env=env, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "confusion (row-normalized):" in r.stdout
