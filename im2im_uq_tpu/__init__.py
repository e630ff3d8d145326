"""im2im_uq_tpu — TPU-native image-to-image regression with distribution-free UQ.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of aangelopoulos/im2im-uq
(reference layout surveyed in SURVEY.md): UNet/WNet trunks with pluggable
uncertainty heads, RCPS calibration with Hoeffding-Bentkus / WSR bounds, the
FastMRI / TEMCA / BSBCM data stacks, and a config-driven experiment router —
redesigned for TPU (NHWC layouts, pjit/GSPMD data parallelism over a device
mesh, on-device vectorized calibration, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"

__all__ = [
    "add_uncertainty",
    "build_trunk",
    "train_net",
    "calibrate_model",
    "eval_set_metrics",
    "data_parallel_mesh",
    "fix_randomness",
]

_LAZY = {
    "add_uncertainty": "im2im_uq_tpu.models.assembly",
    "build_trunk": "im2im_uq_tpu.models.assembly",
    "train_net": "im2im_uq_tpu.training.train",
    "calibrate_model": "im2im_uq_tpu.calibration.rcps",
    "eval_set_metrics": "im2im_uq_tpu.calibration.metrics",
    "data_parallel_mesh": "im2im_uq_tpu.parallel.mesh",
    "fix_randomness": "im2im_uq_tpu.utils.random",
}


def __getattr__(name):
    # lazy top-level API: importing the package stays cheap (no jax import)
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'im2im_uq_tpu' has no attribute {name!r}")
