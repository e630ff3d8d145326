"""im2im_uq_tpu — TPU-native image-to-image regression with distribution-free UQ.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of aangelopoulos/im2im-uq
(reference layout surveyed in SURVEY.md): UNet/WNet trunks with pluggable
uncertainty heads, RCPS calibration with Hoeffding-Bentkus / WSR bounds, the
FastMRI / TEMCA / BSBCM data stacks, and a config-driven experiment router —
redesigned for TPU (NHWC layouts, pjit/GSPMD data parallelism over a device
mesh, on-device vectorized calibration, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"
