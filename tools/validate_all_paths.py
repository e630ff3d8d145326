"""Integration sweep: router end-to-end over fastmri/temca/bsbcm paths with
different heads, on synthetic data in each dataset's exact on-disk schema.

Run: PYTHONPATH=. python tools/validate_all_paths.py  (one TPU or CPU)
"""

import os, sys, time
import numpy as np

BASE = os.environ.get("VALIDATE_DIR", "/tmp/im2im_uq_validate")
os.makedirs(BASE, exist_ok=True)
# stale out_* artifacts from an earlier run trip the router's skip-if-done
# (run_experiment returns None for precomputed results) — every validation
# run must recompute from scratch. Only auto-wipe the DEFAULT scratch dir;
# a user-supplied VALIDATE_DIR may hold results they want, so there the
# wipe must be requested explicitly (VALIDATE_FRESH=1).
if "VALIDATE_DIR" not in os.environ or os.environ.get("VALIDATE_FRESH") == "1":
    import glob as _glob
    import shutil as _shutil

    for _d in _glob.glob(os.path.join(BASE, "out_*")):
        _shutil.rmtree(_d, ignore_errors=True)

# --- fastmri: synthetic HDF5 volumes ---
from im2im_uq_tpu.data.fastmri import write_synthetic_volume
fm_dir = os.path.join(BASE, "fastmri"); os.makedirs(fm_dir, exist_ok=True)
if not os.listdir(fm_dir):
    for i in range(4):
        write_synthetic_volume(os.path.join(fm_dir, f"vol{i}.h5"), num_slices=8,
                               enc_shape=(64, 40), recon_shape=(32, 32), seed=i)

# --- temca: synthetic PNG tiles ---
from PIL import Image
tc_dir = os.path.join(BASE, "temca"); os.makedirs(tc_dir, exist_ok=True)
rng = np.random.RandomState(0)
if not os.listdir(tc_dir):
    for i in range(12):
        Image.fromarray(rng.randint(1, 255, size=(96, 96), dtype=np.uint8), mode="L").save(
            os.path.join(tc_dir, f"tile{i}.png"))

# --- bsbcm: X/Y npy pairs (2-channel input) ---
bs_dir = os.path.join(BASE, "bsbcm"); os.makedirs(bs_dir, exist_ok=True)
if not os.path.exists(os.path.join(bs_dir, "X.npy")):
    np.save(os.path.join(bs_dir, "X.npy"), rng.rand(60, 32, 32, 2).astype(np.float32))
    np.save(os.path.join(bs_dir, "Y.npy"), rng.rand(60, 32, 32, 1).astype(np.float32))

from im2im_uq_tpu.scripts.router import run_experiment
from im2im_uq_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

COMMON = dict(
    model="UNet", alpha=0.2, delta=0.2, num_lambdas=60, rcps_loss="fraction_missed",
    minimum_lambda=0.0, maximum_lambda=6.0, minimum_lambda_softmax=0.0,
    maximum_lambda_softmax=1.2, epochs=1, lr=1e-3, load_from_checkpoint=False,
    checkpoint_dir=None, checkpoint_every=10, validate_every=10,
    num_validation_images=2, q_lo=0.05, q_hi=0.95, q_lo_weight=1, q_hi_weight=1,
    mse_weight=1, num_softmax=20, beta=0.1, seed=0,
)

FASTMRI = dict(
    COMMON, dataset="fastmri", data_path=fm_dir, batch_size=8, num_inputs=1,
    data_split_percentages=[0.6, 0.2, 0.2, 0.0],
    input_normalization="standard", output_normalization="min-max",
)

runs = [
    # every dataset path x a head
    dict(FASTMRI, uncertainty_type="gaussian",
         output_dir=os.path.join(BASE, "out_fastmri")),
    dict(COMMON, dataset="temca", data_path=tc_dir + "/", uncertainty_type="quantiles",
         batch_size=8, num_inputs=1, side_length=32, downsampling_factor=2, num_buffer=3,
         data_split_percentages=[0.5, 0.25, 0.25, 0.0],
         input_normalization="standard", output_normalization="standard",
         output_dir=os.path.join(BASE, "out_temca")),
    dict(COMMON, dataset="bsbcm", data_path=bs_dir, uncertainty_type="softmax",
         batch_size=8, num_inputs=2, data_split_percentages=[0.6, 0.2, 0.2, 0.0],
         input_normalization="min-max", output_normalization="min-max",
         output_dir=os.path.join(BASE, "out_bsbcm")),
    # the remaining four heads (SURVEY §2 #8) end-to-end on the fastmri path
    dict(FASTMRI, uncertainty_type="quantiles_l1",
         output_dir=os.path.join(BASE, "out_fastmri_ql1")),
    dict(FASTMRI, uncertainty_type="residual_magnitude",
         output_dir=os.path.join(BASE, "out_fastmri_rm")),
    dict(FASTMRI, uncertainty_type="residual_magnitude_l1",
         output_dir=os.path.join(BASE, "out_fastmri_rml1")),
    dict(FASTMRI, uncertainty_type="inn",
         output_dir=os.path.join(BASE, "out_fastmri_inn")),
    # WNet trunk on the 2-input bsbcm path
    dict(COMMON, dataset="bsbcm", data_path=bs_dir, uncertainty_type="quantiles",
         model="WNet", batch_size=8, num_inputs=2,
         data_split_percentages=[0.6, 0.2, 0.2, 0.0],
         input_normalization="min-max", output_normalization="min-max",
         output_dir=os.path.join(BASE, "out_bsbcm_wnet")),
    # on-device k-space physics fused into the train/eval programs
    dict(FASTMRI, uncertainty_type="gaussian", on_device_transform=True,
         output_dir=os.path.join(BASE, "out_fastmri_kspace")),
    # grain input pipeline with mid-epoch checkpointing enabled
    dict(FASTMRI, uncertainty_type="gaussian", input_pipeline="grain",
         checkpoint_every_steps=2,
         checkpoint_dir=os.path.join(BASE, "ckpt_fastmri_grain"),
         output_dir=os.path.join(BASE, "out_fastmri_grain")),
]

for cfg in runs:
    t0 = time.time()
    print(f"=== {cfg['dataset']} / {cfg['uncertainty_type']} ===", flush=True)
    results = run_experiment(cfg)
    assert results is not None
    print(f"--> risk={results['risk']:.4f} lhat={results['lhat']:.4f} "
          f"meansize={results['sizes'].mean():.4f} ({time.time()-t0:.0f}s)", flush=True)
print("ALL ROUTER PATHS OK", flush=True)
