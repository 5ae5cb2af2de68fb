"""Guard against silent CPU fallback on the tunneled TPU.

Two failure modes make JAX silently report CPU numbers as TPU numbers:

* The tunnel plugin lives in an out-of-tree site dir (the ambient
  ``PYTHONPATH=/root/.axon_site`` carries the PJRT plugin and its
  sitecustomize) — any invocation that OVERWRITES PYTHONPATH (e.g.
  ``PYTHONPATH=. python script.py``) silently loses the plugin and bare
  libtpu init fails ("could not determine TPU worker hostnames").
* Transient tunnel/teardown races while another process holds the chip.

Plugin discovery runs once per process, so recovery means repairing the
environment and re-exec'ing the script — not clearing backends.
"""

from __future__ import annotations

import os
import sys
import time

_PLUGIN_SITES = ("/root/.axon_site",)


def _cpu_opt_out() -> bool:
    """True when this process deliberately selected CPU — via the env var
    or via jax.config.update("jax_platforms", "cpu") (both documented in
    CLAUDE.md).  Without this check a deliberately-CPU process would burn
    every retry re-exec'ing."""
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return True
    return (getattr(jax.config, "jax_platforms", None) or "").strip() \
        == "cpu"


def _probe_backend(timeout_s: float) -> str:
    """Backend init in a THROWAWAY subprocess under a hard timeout.

    A hung tunnel blocks backend init inside the PJRT C API for tens of
    minutes and the blocked thread never handles SIGTERM (observed: 33 min
    before "UNAVAILABLE" surfaced) — probing in-process would hang the
    script unrecoverably, and so would ``timeout`` without ``-k``.
    subprocess.run's timeout SIGKILLs.  Returns "up" / "down" / "hang".
    """
    import subprocess
    root = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    code = ("import sys; sys.path.insert(0, %r); "
            "import pose3d_tpu, jax; "
            "sys.exit(0 if jax.default_backend() != 'cpu' else 3)" % root)
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return "up" if r.returncode == 0 else "down"
    except subprocess.TimeoutExpired:
        return "hang"


def require_tpu(retries: int = 4, wait_s: int = 30,
                env: str = "P3D_TPU_RETRY") -> bool:
    """Re-exec the current script until the TPU backend is up.

    Repairs a clobbered PYTHONPATH (re-appending known plugin site dirs)
    before the first retry.  Returns True when running on an accelerator;
    False when retries are exhausted (caller should label its output as
    CPU-only).  No-op when the process was explicitly pointed at CPU.

    Before touching the backend IN-PROCESS, a subprocess probe
    (``P3D_TPU_PROBE_TIMEOUT`` seconds, default 240; 0 disables) checks
    that init terminates at all: a hung tunnel otherwise blocks
    ``jax.default_backend()`` in C code indefinitely.  When every probe
    hangs/fails the guard forces the cpu platform so the caller runs —
    and labels — a CPU fallback instead of hanging forever.
    """
    import jax
    if _cpu_opt_out():
        return False
    # repair PYTHONPATH up front: the probe subprocess and any re-exec
    # both inherit it
    pp = os.environ.get("PYTHONPATH", "")
    parts = [p for p in pp.split(":") if p]
    for site in _PLUGIN_SITES:
        if os.path.isdir(site) and site not in parts:
            parts.append(site)
            print(f"PYTHONPATH was missing {site} (the TPU plugin "
                  "site dir) — repairing", file=sys.stderr, flush=True)
    os.environ["PYTHONPATH"] = ":".join(parts)

    probe_timeout = float(os.environ.get("P3D_TPU_PROBE_TIMEOUT", "240"))
    if probe_timeout > 0:
        for attempt in range(retries + 1):
            status = _probe_backend(probe_timeout)
            if status == "up":
                break
            print(f"TPU probe {status} (attempt {attempt + 1}/"
                  f"{retries + 1})", file=sys.stderr, flush=True)
            if attempt < retries:
                time.sleep(wait_s)
        else:
            print("WARNING: TPU backend unreachable (probe hung/failed "
                  "every attempt) — forcing cpu platform; measurements "
                  "below are NOT TPU numbers", file=sys.stderr, flush=True)
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
            return False
    try:
        if jax.default_backend() != "cpu":
            return True
    except RuntimeError as e:
        # a pinned JAX_PLATFORMS whose backend init fails hard (tunnel
        # outage: "Unable to initialize backend 'axon': UNAVAILABLE")
        # raises instead of falling back — same recovery: wait + re-exec
        print(f"TPU backend init raised: {e}", file=sys.stderr, flush=True)
    n = int(os.environ.get(env, "0"))
    # re-exec replays sys.argv — only possible for real script files.
    # ``python -m pkg.mod`` sets argv[0] to the module FILE; replaying it
    # as a plain script changes sys.path/package semantics, so refuse.
    main_pkg = getattr(sys.modules.get("__main__"), "__package__", None)
    can_reexec = (bool(sys.argv) and os.path.exists(sys.argv[0])
                  and not main_pkg)
    if n < retries and can_reexec:
        # (PYTHONPATH was already repaired above; the re-exec inherits it)
        delay = 0 if n == 0 else wait_s      # first retry: repair only
        print(f"TPU init failed (attempt {n + 1}/{retries}); "
              f"re-exec in {delay} s", file=sys.stderr, flush=True)
        time.sleep(delay)
        os.environ[env] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    print("WARNING: TPU init failed repeatedly — running on CPU; "
          "measurements below are NOT TPU numbers", file=sys.stderr,
          flush=True)
    return False
