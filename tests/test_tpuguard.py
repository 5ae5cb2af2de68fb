"""Unit tests for the silent-CPU-fallback guard (utils/tpuguard.py).

The guard protects every bench/profile script from reporting CPU numbers
as TPU numbers (CLAUDE.md environment gotchas).  These tests cover its
decision logic on CPU; the re-exec recovery itself only manifests on the
tunneled device.
"""

import sys

import pytest

import jax

from pose3d_tpu.utils import tpuguard


def test_cpu_opt_out_env(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tpuguard._cpu_opt_out()


def test_cpu_opt_out_config(monkeypatch):
    # the suite conftest forces the cpu platform through jax.config — the
    # guard must recognize that opt-out (ADVICE r2) without consulting env
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert tpuguard._cpu_opt_out()


def test_require_tpu_is_noop_on_deliberate_cpu():
    # under the conftest's forced-cpu config this must return immediately
    # (no sleeps, no re-exec) and report "not on an accelerator"
    assert tpuguard.require_tpu() is False


def test_require_tpu_survives_backend_init_raise(monkeypatch):
    """A pinned platform whose backend init fails hard raises RuntimeError
    from jax.default_backend() ("Unable to initialize backend 'axon':
    UNAVAILABLE" during a tunnel outage).  The guard must treat that like
    a CPU fallback — retry/return False — not crash the script."""
    monkeypatch.setattr(tpuguard, "_cpu_opt_out", lambda: False)
    monkeypatch.setattr(tpuguard, "_probe_backend", lambda t: "up")

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': "
                           "UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(jax, "default_backend", boom)
    # retries exhausted -> must take the give-up path, not os.execv
    monkeypatch.setenv("P3D_TPU_RETRY", "99")
    assert tpuguard.require_tpu(retries=2, wait_s=0) is False


def test_env_cpu_wins_over_force_selecting_plugin():
    """JAX_PLATFORMS=cpu + `import pose3d_tpu` must select cpu even on the
    image revision whose plugin force-prepends axon to jax.config (a dead
    tunnel then raises instead of falling through to cpu — observed killing
    the CLI e2e subprocess during an outage)."""
    import os
    import subprocess
    import pose3d_tpu
    root = os.path.dirname(os.path.dirname(os.path.abspath(
        pose3d_tpu.__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); import pose3d_tpu, jax; "
         "print('CFG=' + str(jax.config.jax_platforms))" % root],
        env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
    assert "CFG=cpu" in r.stdout


def test_require_tpu_hung_tunnel_forces_cpu(monkeypatch):
    """A HUNG tunnel blocks backend init in C code for tens of minutes
    (SIGTERM-immune) — the guard must detect it via the subprocess probe
    and force the cpu platform (labeled fallback) instead of hanging the
    script forever, and must never re-exec (the replay would hang too)."""
    monkeypatch.setattr(tpuguard, "_cpu_opt_out", lambda: False)
    probes = []

    def fake_probe(timeout_s):
        probes.append(timeout_s)
        return "hang"

    monkeypatch.setattr(tpuguard, "_probe_backend", fake_probe)
    execs = []
    monkeypatch.setattr(tpuguard.os, "execv", lambda *a: execs.append(a))
    forced = []
    monkeypatch.setattr(jax.config, "update",
                        lambda *a: forced.append(a))
    assert tpuguard.require_tpu(retries=2, wait_s=0) is False
    assert len(probes) == 3          # initial + 2 retries
    assert not execs
    assert ("jax_platforms", "cpu") in forced


def test_require_tpu_probe_disabled_by_env(monkeypatch):
    """P3D_TPU_PROBE_TIMEOUT=0 skips the subprocess probe entirely (the
    in-process path must still run)."""
    monkeypatch.setattr(tpuguard, "_cpu_opt_out", lambda: False)
    monkeypatch.setenv("P3D_TPU_PROBE_TIMEOUT", "0")

    def no_probe(timeout_s):
        raise AssertionError("probe must not run when disabled")

    monkeypatch.setattr(tpuguard, "_probe_backend", no_probe)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert tpuguard.require_tpu() is True


def test_require_tpu_never_reexecs_python_dash_m(monkeypatch):
    """python -m pkg.mod sets argv[0] to the module FILE; replaying it as
    a plain script changes sys.path/package semantics, so the guard must
    refuse to re-exec (ADVICE r2) and fall through to the warning path."""
    monkeypatch.setattr(tpuguard, "_cpu_opt_out", lambda: False)
    monkeypatch.setattr(tpuguard, "_probe_backend", lambda t: "up")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("P3D_TPU_RETRY", "0")

    class FakeMain:
        __package__ = "pose3d_tpu.scripts"

    monkeypatch.setitem(sys.modules, "__main__", FakeMain())
    execs = []
    monkeypatch.setattr(tpuguard.os, "execv",
                        lambda *a: execs.append(a))
    assert tpuguard.require_tpu(retries=4, wait_s=0) is False
    assert not execs
