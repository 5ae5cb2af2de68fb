"""pose3d_tpu — TPU-native triplet-manifold 3D pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the Wohlhart-Lepetit descriptor
pipeline (reference: mingliangfu/3DPoseEstimation, C++/Caffe/OpenGL), built
TPU-first:

* compute path: jitted XLA programs, MXU matmuls for kNN / rasterization,
  fused on-device triplet batch assembly and augmentation;
* scale-out: ``jax.sharding.Mesh`` + data-parallel sharding over ICI;
* host path: thin NumPy/h5py orchestration plus a native C++ data plane.

Layout mirrors the reference's layer map (SURVEY.md §1) but each layer is
re-architected for XLA's compilation model rather than translated.
"""

__version__ = "0.1.0"

import os as _os


def _normalize_platform():
    """Survive the image's pinned ``JAX_PLATFORMS=axon``.

    Depending on the image revision, the tunneled-TPU PJRT plugin either
    force-selects itself (env var ignored) or registers under the standard
    ``tpu`` platform name — in the latter case a pinned ``axon`` makes any
    backend init raise "Backend 'axon' is not in the list of known
    backends".  Normalize to auto-select before the backend initializes;
    explicit overrides (tests forcing ``cpu`` via jax.config) still win
    because they run before first device use too.
    """
    env = _os.environ.get("JAX_PLATFORMS")
    if env and env != "axon":
        # e.g. JAX_PLATFORMS=cpu: on the force-selecting image revision the
        # plugin overrides the env var and still initializes the tunneled
        # backend (observed: a cpu-pinned CLI subprocess dying on "Unable
        # to initialize backend 'axon'" during a tunnel outage).  Mirror
        # the explicit env choice into jax.config, which does win.
        try:
            import jax
            cur = jax.config.jax_platforms
            # the plugin imposes e.g. "axon,cpu" (axon first — and a DEAD
            # tunnel raises instead of falling through to cpu); anything
            # axon-leading or unset is plugin-imposed, not a user choice
            if cur in (None, "", env) or str(cur).startswith("axon"):
                jax.config.update("jax_platforms", env)
        except Exception:
            pass  # backend already initialized (choice already made)
        return
    if env != "axon":
        return
    _os.environ["JAX_PLATFORMS"] = ""          # subprocesses inherit the fix
    try:
        import jax
        # respect an explicit earlier choice (tests/dryrun force "cpu"
        # through jax.config before importing this package)
        if jax.config.jax_platforms in (None, "", "axon"):
            jax.config.update("jax_platforms", "")  # env was read at import
    except Exception:
        pass  # backend already initialized (platform choice already made)


_normalize_platform()

from pose3d_tpu.config import Config, load_config  # noqa: F401
