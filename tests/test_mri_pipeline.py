"""On-device k-space pipeline: parity with the host transform + fused step.

The device path (ops/mri_pipeline.py) must reproduce the host
UnetDataTransform recipe (data/transforms.py, itself parity-tested against
the reference) and compile into the train step via the preprocess hook.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.data.subsample import create_mask_for_mask_type
from im2im_uq_tpu.data.transforms import (
    UnetDataTransform,
    apply_mask,
    to_real_pair,
)
from im2im_uq_tpu.ops.mri_pipeline import (
    center_crop,
    complex_center_crop,
    zero_filled_recon,
)
from im2im_uq_tpu.utils.cache import enable_compilation_cache

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()


def _random_kspace(rng, shape):
    return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(np.complex64)


def test_zero_filled_recon_matches_host_transform():
    rng = np.random.RandomState(0)
    mask_func = create_mask_for_mask_type("equispaced", [0.08], [4])
    host = UnetDataTransform("singlecoil", mask_func=mask_func, use_seed=True)
    ks_batch, host_imgs, masks = [], [], []
    for i in range(3):
        kspace = _random_kspace(rng, (40, 32))
        target = rng.rand(24, 24).astype(np.float32)
        image, tgt, *_ = host(kspace, None, target, {"max": 1.0}, f"file{i}.h5", i)
        # regenerate the same mask (same filename seed) for the device path
        pair = to_real_pair(kspace)
        _, mask = apply_mask(pair, mask_func, tuple(map(ord, f"file{i}.h5")))
        ks_batch.append(pair)
        masks.append(mask)
        host_imgs.append(image)
    ks = jnp.asarray(np.stack(ks_batch))          # (B, H, W, 2)
    mask = jnp.asarray(np.stack(masks))           # (B, 1, W, 1)
    got = jax.jit(lambda k, m: zero_filled_recon(k, m, (24, 24)))(ks, mask)
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], np.stack(host_imgs), rtol=2e-4, atol=1e-5
    )


def test_zero_filled_recon_multicoil_and_no_mask():
    rng = np.random.RandomState(1)
    kspace = _random_kspace(rng, (2, 4, 16, 16))  # (B, coils, H, W)
    pair = jnp.asarray(to_real_pair(kspace))
    out = zero_filled_recon(pair, None, (12, 12), multicoil=True)
    assert out.shape == (2, 12, 12, 1)
    # rss of per-coil magnitudes, computed by hand
    from im2im_uq_tpu.ops import fftc

    img = fftc.ifft2c(pair)
    img = complex_center_crop(img, (12, 12))
    per_coil = np.asarray(fftc.complex_abs(img))
    np.testing.assert_allclose(
        np.asarray(out)[..., 0],
        np.sqrt((per_coil**2).sum(axis=1)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_crop_guards():
    with pytest.raises(ValueError):
        complex_center_crop(jnp.zeros((8, 8, 2)), (10, 4))
    with pytest.raises(ValueError):
        center_crop(jnp.zeros((8, 8)), (4, 10))


def test_train_step_with_fused_kspace_preprocess():
    """The physics compiles into the train-step program and grads flow."""
    import optax

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    cfg = {"model": "UNet", "uncertainty_type": "quantiles", "q_lo": 0.05,
           "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0}
    crop = (16, 16)
    st = add_uncertainty(build_trunk(cfg), cfg, rng=jax.random.key(0),
                         example_input=jnp.zeros((1, *crop, 1)))
    tx = optax.adam(1e-3)
    ts = TrainState(params=st.variables["params"],
                    batch_stats=st.variables["batch_stats"],
                    opt_state=tx.init(st.variables["params"]),
                    step=jnp.zeros((), jnp.int32))
    rng = np.random.RandomState(2)
    kspace = to_real_pair(_random_kspace(rng, (4, 20, 18)))
    mask = (rng.rand(1, 1, 18, 1) > 0.5).astype(np.float32)
    y = rng.rand(4, *crop, 1).astype(np.float32)
    m = np.ones((4,), np.float32)
    step = make_train_step(
        st.model, head_loss_pe_fn("quantiles"), cfg, tx,
        preprocess=lambda k: zero_filled_recon(k, jnp.asarray(mask), crop),
    )
    losses = []
    for _ in range(3):
        ts, loss = step(ts, kspace, y, m)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # training moves on raw k-space input


def test_fastmri_dataset_kspace_mode_matches_image_mode(tmp_path):
    """Dataset in raw-kspace mode + device_preprocess reproduces the
    image-mode items (same masks via per-filename seeding)."""
    from im2im_uq_tpu.data.fastmri import FastMRIDataset, write_synthetic_volume
    from im2im_uq_tpu.data.normalize import normalize_dataset
    from im2im_uq_tpu.utils.random import fix_randomness

    fix_randomness(0)
    for i in range(2):
        write_synthetic_volume(str(tmp_path / f"vol{i}.h5"), num_slices=4,
                               enc_shape=(40, 32), recon_shape=(24, 24), seed=i)
    ds = FastMRIDataset(
        str(tmp_path), normalize_input="standard", normalize_output="min-max",
        mask_info={"type": "equispaced", "center_fraction": [0.08], "acceleration": [4]},
    )
    ds = normalize_dataset(ds)  # attaches norm_params (image mode)
    ds.transform.use_seed = True  # deterministic per-filename masks for parity
    x_img, y_img = ds[0]
    ds.return_kspace = True
    k, y_k = ds[0]
    assert k.shape == (40, 32, 2) and k.dtype == np.float32
    np.testing.assert_allclose(y_k, y_img, rtol=1e-6, atol=1e-7)
    pre = ds.device_preprocess((24, 24))
    x_dev = np.asarray(jax.jit(pre)(jnp.asarray(k[None])))[0]
    np.testing.assert_allclose(x_dev, x_img, rtol=2e-4, atol=1e-5)


def test_router_on_device_transform_end_to_end(tmp_path):
    """Full router run with on_device_transform: training consumes raw
    k-space (physics fused into the step), calibration/eval/image panels run
    in image mode, artifacts land with the normal contract."""
    import pickle

    from im2im_uq_tpu.data.fastmri import write_synthetic_volume
    from im2im_uq_tpu.scripts.router import results_filename, run_experiment

    data = tmp_path / "vols"
    data.mkdir()
    for i in range(2):
        write_synthetic_volume(str(data / f"v{i}.h5"), num_slices=8,
                               enc_shape=(40, 32), recon_shape=(24, 24), seed=i)
    config = {
        "dataset": "fastmri", "data_path": str(data), "model": "UNet",
        "uncertainty_type": "quantiles", "num_inputs": 1,
        "data_split_percentages": [0.5, 0.25, 0.25, 0.0],
        "alpha": 0.5, "delta": 0.5, "num_lambdas": 20,
        "minimum_lambda": 0.0, "maximum_lambda": 6.0,
        "rcps_loss": "fraction_missed", "epochs": 1, "batch_size": 8,
        "lr": 1e-3, "checkpoint_every": 5, "validate_every": 1,
        "num_validation_images": 1, "q_lo": 0.05, "q_hi": 0.95,
        "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
        "input_normalization": "standard", "output_normalization": "min-max",
        "output_dir": str(tmp_path / "out"), "seed": 0,
        "on_device_transform": True,
        "mask_info": {"type": "equispaced", "center_fraction": [0.08],
                      "acceleration": [4]},
    }
    results = run_experiment(config)
    assert results is not None and np.isfinite(results["risk"])
    assert results["lhat"] is not None
    with open(results_filename(config), "rb") as fh:
        saved = pickle.load(fh)
    assert saved["risk"] == results["risk"]
