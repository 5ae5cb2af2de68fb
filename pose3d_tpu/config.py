"""Typed configuration, drop-in compatible with the reference INI dialect.

The reference parses its INI with boost::property_tree independently in each
component (reference src/datasetmanager.cpp:802-831, src/networksolver.cpp:507-548,
src/networkevaluator.cpp:360-370,418-424). The shipped ``config.ini`` is
*incomplete* relative to the keys the code reads unconditionally (it lacks
``use_simulated``, ``num_bootstrapping_rounds`` and the whole ``[output]``
section) — so this rebuild defines every key with a default and validates once,
up front, instead of scattering ad-hoc ``get<>`` calls.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Dict, List


def _split_csv(s: str) -> List[str]:
    return [t.strip() for t in s.split(",") if t.strip() != ""]


@dataclass
class Config:
    # [paths]
    dataset_path: str = ""
    hdf5_path: str = ""
    network_path: str = ""
    background_path: str = ""
    output_path: str = ""
    simulated_templates_path: str = ""
    simulated_training_path: str = ""

    # [input]
    dataset_name: str = "LineMOD"
    models: List[str] = field(default_factory=list)
    used_models: List[str] = field(default_factory=list)
    # per-model rotation symmetry: 0 = normal, 1 = rotation-invariant,
    # 2 = symmetric. Both non-zero values share elevation-based handling
    # (reference src/networksolver.cpp:79,147).
    rot_inv: List[int] = field(default_factory=list)
    inplane: bool = True
    use_real: bool = True
    use_simulated: bool = False
    # 0 none, 1 color noise, 2 shapes, 3 fractal, 4 real, -1 random of {1,2,3}
    # (reference src/datasetmanager.cpp:786-800; the config.ini comment saying
    # "3 - real backgrounds" is wrong w.r.t. the code).
    random_background: int = 0

    # [train]
    net_name: str = "manifold_rgbd_16"
    gpu: bool = False  # kept for INI compat; ignored (devices come from JAX)
    num_epochs: int = 1
    num_training_rounds: int = 30
    num_bootstrapping_rounds: int = 0
    learning_rate: float = 0.001
    momentum: float = 0.9
    weight_decay: float = 0.001
    learning_policy: str = "step"
    step_size: int = 15000
    gamma: float = 0.9
    binarization: bool = False
    binarization_epochs: int = 10
    binarization_net_name: str = "manifold_rgbdnor_16_bin"

    # [output]
    knn: int = 3
    log_name: str = "log.txt"
    log_epoch: int = 1

    # --- rebuild-only knobs (absent from the reference; safe defaults) ---
    batch_size: int = 0          # 0 -> take from the net spec (like Caffe blob)
    seed: int = 0                # jax.random root key
    data_parallel: int = 0       # 0 -> use all visible devices
    compute_dtype: str = "float32"
    # evaluation/serving descriptor mode: bf16 trunk intermediates run ~2x
    # the f32 descriptor throughput on TPU (HBM-bound conv1, see
    # scripts/profile_forward.py) with protocol-identical retrieval
    # (LEARNING_r3.json records the side-by-side histograms); descriptors
    # themselves still come out float32.  Set "float32" to disable.
    serving_dtype: str = "bfloat16"
    # device-resident sample storage: "bfloat16" halves the HBM held by the
    # training/template tensors (the batcher promotes gathered batches back
    # to f32) — required to fit the full 15-object LineMOD workload at
    # subdiv 3 on one 16 GB chip (scripts/bench_e2e.py runs this mode)
    storage_dtype: str = "float32"
    # icosphere subdivision for synthetic views (reference hardcodes 2/3,
    # src/datasetmanager.cpp:584-586); lower values for smoke tests
    template_subdiv: int = 2
    training_subdiv: int = 3
    # parity-packed conv+pool stem in the TRAINING step (same multiply-add
    # terms, reassociated; 4x MXU lane occupancy, no full-resolution conv
    # intermediate in HBM).  Default ON: the full fused step runs 2.50 ->
    # 1.49 ms/iter on v5e (PROFILE_STEP "full step fused stem"), losses
    # match the plain path to f32 reassociation tolerance
    # (tests/test_train_eval.py::test_solver_fused_stem_matches_plain) and
    # the learning gate passes (LEARNING_r3.json).  The serving/descriptor
    # forward keeps the plain stem (measured slower there; bit-parity
    # paths pass precision="highest" through the plain convs).
    train_fused_stem: bool = True

    # ------------------------------------------------------------------
    def __post_init__(self) -> None:
        if not self.used_models:
            self.used_models = list(self.models)
        if not self.rot_inv:
            self.rot_inv = [0] * len(self.models)
        if len(self.rot_inv) < len(self.models):
            self.rot_inv = self.rot_inv + [0] * (len(self.models) - len(self.rot_inv))

    @property
    def model_index(self) -> Dict[str, int]:
        """Global model name -> index, as the reference builds from [input] models."""
        return {m: i for i, m in enumerate(self.models)}

    @property
    def nr_objects(self) -> int:
        return len(self.used_models)

    def validate(self) -> None:
        if not self.models:
            raise ValueError("config: [input] models must be non-empty")
        for m in self.used_models:
            if m not in self.models:
                raise ValueError(f"config: used model {m!r} not in models list")
        if self.random_background not in (-1, 0, 1, 2, 3, 4):
            raise ValueError(
                f"config: random_background={self.random_background} not in "
                "{-1,0,1,2,3,4}")
        if self.learning_policy not in ("step", "fixed"):
            raise ValueError(f"config: unknown learning_policy {self.learning_policy!r}")
        # compute/serving accept the bit-parity mode float32_full
        # (precision_from_config maps it to precision='highest');
        # storage is a memory layout — only real dtypes make sense
        for key in ("compute_dtype", "serving_dtype"):
            v = getattr(self, key)
            if v not in ("float32", "float32_full", "bfloat16"):
                raise ValueError(
                    f"config: {key}={v!r} not in "
                    "{float32, float32_full, bfloat16}")
        if self.storage_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"config: storage_dtype={self.storage_dtype!r} not in "
                "{float32, bfloat16}")


_BOOL_KEYS = {"inplane", "use_real", "use_simulated", "gpu", "binarization",
              "train_fused_stem"}
_INT_KEYS = {"num_epochs", "num_training_rounds", "num_bootstrapping_rounds",
             "step_size", "binarization_epochs", "random_background", "knn",
             "log_epoch", "batch_size", "seed", "data_parallel",
             "template_subdiv", "training_subdiv"}
_FLOAT_KEYS = {"learning_rate", "momentum", "weight_decay", "gamma"}
_LIST_KEYS = {"models", "used_models"}

# INI key -> dataclass field where the names differ
_RENAME = {
    "rotinv": "rot_inv",
    "knn": "knn",
    "simulated_templates_path": "simulated_templates_path",
    "simulated_training_set_path": "simulated_training_path",
}


def load_config(path: str) -> Config:
    """Load a reference-dialect INI into a validated :class:`Config`."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    parser = configparser.ConfigParser(inline_comment_prefixes=("#", ";"))
    parser.read(path)

    fields = {f.name: f for f in dataclasses.fields(Config)}
    kwargs = {}
    for section in parser.sections():
        for key, raw in parser[section].items():
            k = key.strip().lower()
            k = _RENAME.get(k, k)
            if k == "rot_inv":
                kwargs[k] = [int(x) for x in _split_csv(raw)]
                continue
            if k not in fields:
                continue  # unknown keys are ignored, like property_tree would
            if k in _LIST_KEYS:
                kwargs[k] = _split_csv(raw)
            elif k in _BOOL_KEYS:
                kwargs[k] = raw.strip().lower() in ("true", "1", "yes", "on")
            elif k in _INT_KEYS:
                kwargs[k] = int(raw.strip())
            elif k in _FLOAT_KEYS:
                kwargs[k] = float(raw.strip())
            else:
                kwargs[k] = raw.strip()
    cfg = Config(**kwargs)
    cfg.validate()
    return cfg
