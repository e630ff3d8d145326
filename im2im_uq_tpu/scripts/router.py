"""Experiment router: config → train → calibrate → evaluate → artifacts.

Counterpart of the reference orchestration layer (reference: core/scripts/
router.py:30-182), driven by the same sweep-YAML schema but with no wandb
dependency: ``python -m im2im_uq_tpu.scripts.router --config <yml>`` runs
every grid point sequentially (or one with ``--grid-index``), mirroring a
wandb agent's per-point processes.

Per grid point (same order and artifact contract as the reference):
  fix randomness → skip if results pickle exists (router.py:41-43) →
  build dataset (+streaming normalization for fastmri, router.py:69-72) →
  trunk + uncertainty head (router.py:80-87) → 4-way split (router.py:90-104)
  → train → validation loss table → RCPS calibration → concatenated loss
  table dump (router.py:138) → image panels → set metrics → results pickle
  with identical filename keying (router.py:40).

Artifacts are numpy-backed pickles (no torch): results_*.pkl holds plain
np.ndarrays, loss_table_*.pth holds the pickled (N_calib+N_val, L) table.
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Optional

import numpy as np

from im2im_uq_tpu.calibration.metrics import eval_set_metrics
from im2im_uq_tpu.calibration.rcps import calibrate_model
from im2im_uq_tpu.data.core import random_split, split_lengths
from im2im_uq_tpu.data.normalize import normalize_dataset
from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.parallel.mesh import data_parallel_mesh
from im2im_uq_tpu.training.evaluate import get_images, get_loss_table
from im2im_uq_tpu.training.train import train_net
from im2im_uq_tpu.utils.config import load_config
from im2im_uq_tpu.utils.logging import MetricsLogger
from im2im_uq_tpu.utils.random import fix_randomness

__all__ = ["results_filename", "loss_table_filename", "build_dataset", "run_experiment", "main"]


def _config_key(config: dict) -> str:
    return (
        config["dataset"]
        + "_"
        + config["uncertainty_type"]
        + "_"
        + str(config["batch_size"])
        + "_"
        + str(config["lr"])
        + "_"
        + config["input_normalization"]
        + "_"
        + config["output_normalization"].replace(".", "_")
    )


def results_filename(config: dict) -> str:
    """Same naming contract as the reference (router.py:40)."""
    return os.path.join(config["output_dir"], f"results_{_config_key(config)}.pkl")


def loss_table_filename(config: dict) -> str:
    """Same naming contract as the reference (router.py:138)."""
    return os.path.join(config["output_dir"], f"loss_table_{_config_key(config)}.pth")


def build_dataset(config: dict):
    """Dataset dispatch (reference router.py:58-77).

    Data locations come from ``config['data_path']`` instead of the
    reference's hard-coded cluster paths (router.py:64,67,74).
    """
    name = config["dataset"]
    path = config.get("data_path")
    if path:
        path = os.path.expanduser(path)
    if name == "synthetic":
        from im2im_uq_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(
            num_examples=config.get("num_examples", 128),
            image_size=config.get("image_size", 64),
            num_channels_in=config.get("num_inputs", 1),
            seed=config.get("seed", 0),
        )
    if name == "CIFAR10":
        from im2im_uq_tpu.data.cifar10 import CIFAR10Dataset

        return CIFAR10Dataset(path, seed=config.get("seed", 0))
    if name == "fastmri":
        from im2im_uq_tpu.data.fastmri import FastMRIDataset

        mask_info = config.get(
            "mask_info",
            {"type": "equispaced", "center_fraction": [0.08], "acceleration": [4]},
        )
        ds = FastMRIDataset(
            path,
            normalize_input=config["input_normalization"],
            normalize_output=config["output_normalization"],
            mask_info=mask_info,
            num_volumes=config.get("num_volumes"),
            slice_sample_period=config.get("slice_sample_period", 1),
        )
        ds = normalize_dataset(ds)
        config.update(ds.norm_params)
        return ds
    if name == "temca":
        from im2im_uq_tpu.data.temca import TEMCADataset

        side = config["side_length"]
        down = config["downsampling_factor"]
        return TEMCADataset(
            path,
            patch_size=(side, side),
            downsampling=(down, down),
            buffer_size=config["num_buffer"],
            normalize="01",
        )
    if name == "bsbcm":
        from im2im_uq_tpu.data.bsbcm import BSBCMDataset

        return BSBCMDataset(path, num_instances="all", normalize=config["output_normalization"])
    raise NotImplementedError(f"unknown dataset {name!r}")


def split_dataset(dataset, config: dict, rng: np.random.RandomState):
    """4-way split; TEMCA splits by partitioning tile paths (router.py:90-104)."""
    pcts = config["data_split_percentages"]
    if config["dataset"] == "temca":
        return dataset.split_by_paths(pcts, rng)[:3] + (None,)
    lengths = split_lengths(len(dataset), pcts)
    return tuple(random_split(dataset, lengths, rng))


def run_experiment(config: dict, mesh=None) -> Optional[dict]:
    """One grid point end-to-end; returns the results dict (or None if skipped)."""
    fix_randomness(config.get("seed", 0))
    if config.get("output_dir"):
        os.makedirs(config["output_dir"], exist_ok=True)
        fname = results_filename(config)
        if os.path.exists(fname):
            print(f"Results already precomputed and stored in {fname}!")
            return None
    else:
        fname = None
    print("Computing the results from scratch!")

    logger = MetricsLogger(config.get("output_dir"), config=config)
    mesh = mesh or data_parallel_mesh()

    dataset = build_dataset(config)
    train_ds, calib_ds, val_ds, _ = split_dataset(
        dataset, config, np.random.RandomState(config.get("seed", 0))
    )

    import jax
    import jax.numpy as jnp

    x0, y0 = train_ds[0] if hasattr(train_ds, "__getitem__") else next(iter(train_ds))
    trunk = build_trunk(config)
    state = add_uncertainty(
        trunk,
        config,
        rng=jax.random.key(config.get("seed", 0)),
        example_input=jnp.asarray(x0)[None],
    )

    # on_device_transform (fastmri): train on raw k-space with the physics
    # (mask already applied host-side; IFFT/crop/magnitude/normalization)
    # fused into the train/val step programs (ops/mri_pipeline.py). The
    # loader then ships k-space bytes and the device never waits on host
    # FFTs. Calibration/eval below run in image mode — statistically
    # identical, since the transform draws a fresh mask per access either
    # way (use_seed=False, reference FastMRIDataset.py:88).
    # TEMCA variant: return_raw ships uint8 patch bytes; normalize +
    # downsample/upsample run on device via preprocess_pair
    # (data/temca.py device_preprocess_pair). TEMCA splits are deep copies
    # (split_by_paths), so the mode flag flips on the train/val copies.
    preprocess = preprocess_pair = None
    raw_targets: list = []
    raw_attr = None
    if bool(config.get("on_device_transform")):
        if hasattr(dataset, "device_preprocess"):
            crop = (np.asarray(y0).shape[0], np.asarray(y0).shape[1])
            preprocess = dataset.device_preprocess(crop)
            raw_attr = "return_kspace"
            raw_targets = [dataset]  # train/val Subsets delegate to this
        elif hasattr(dataset, "device_preprocess_pair"):
            preprocess_pair = dataset.device_preprocess_pair()
            raw_attr = "return_raw"
            raw_targets = [d for d in (train_ds, val_ds)
                           if hasattr(d, "return_raw")]

    def _image_mode():
        for d in raw_targets:
            setattr(d, raw_attr, False)

    def _kspace_mode():
        for d in raw_targets:
            setattr(d, raw_attr, True)

    _kspace_mode()

    def validation_hook(current_state, epoch, global_step):
        # per-validation image panels (reference run_validation, train.py:29-58);
        # failures must not kill training (reference wraps in try/except too)
        try:
            _image_mode()  # panels render image-domain inputs
            panels = get_images(
                current_state,
                val_ds,
                list(range(config["num_validation_images"])),
                config,
            )["panels"]
            for tag, imgs in panels.items():
                logger.log_images(tag, imgs, step=epoch)
        except Exception as e:
            print(f"Failed logging images. ({e})")
        finally:
            _kspace_mode()

    from im2im_uq_tpu.training.train import PreemptionInterrupt

    try:
        state = train_net(
            state,
            train_ds,
            val_ds,
            mesh,
            epochs=config["epochs"],
            batch_size=config["batch_size"],
            lr=config["lr"],
            load_from_checkpoint=config.get("load_from_checkpoint", False),
            checkpoint_dir=config.get("checkpoint_dir"),
            checkpoint_every=config.get("checkpoint_every", 1),
            validate_every=config.get("validate_every", 10),
            config=config,
            logger=logger,
            validation_hook=validation_hook,
            preprocess=preprocess,
            preprocess_pair=preprocess_pair,
        )
    except PreemptionInterrupt as e:
        # graceful_shutdown saved a resumable checkpoint; exit with the
        # conventional SIGTERM status so schedulers see a clean preemption
        print(e)
        raise SystemExit(143)
    _image_mode()  # calibration/eval/artifacts run on image-domain items
    print("Done training!")

    print("Get the validation loss table.")
    val_loss_table = get_loss_table(state, val_ds, config, mesh=mesh)
    print("Calibrate the model.")
    state, calib_loss_table = calibrate_model(state, calib_ds, config, mesh=mesh)
    print(f"Model calibrated! lambda hat = {state.lhat}")

    if config.get("checkpoint_dir"):
        # persist the λ̂-bearing serving artifact (consumed by scripts.infer)
        from im2im_uq_tpu.training.checkpoint import save_calibrated_checkpoint

        cal_path = save_calibrated_checkpoint(state, config, config["checkpoint_dir"])
        print(f"Calibrated checkpoint saved: {cal_path}")

    if config.get("output_dir"):
        table = np.concatenate([calib_loss_table, val_loss_table], axis=0)
        with open(loss_table_filename(config), "wb") as fh:
            pickle.dump(table, fh, protocol=pickle.HIGHEST_PROTOCOL)
        print("Loss table saved!")

    images = get_images(
        state, val_ds, list(range(config["num_validation_images"])), config
    )
    for tag, imgs in images["panels"].items():
        logger.log_images(tag, imgs, step="final")

    print("GET THE METRICS INCLUDING SPATIAL MISCOVERAGE")
    metrics = eval_set_metrics(state, val_ds, config, mesh=mesh)
    print(
        f"Risk: {metrics.risk}  |  Mean size: {metrics.sizes.mean()}  |  "
        f"Spearman: {metrics.spearman}  |  Size-stratified risk: {metrics.stratified_risks} | "
        f"MSE: {metrics.mse}"
    )
    logger.log(
        {
            "epoch": config["epochs"] + 1,
            "risk": metrics.risk,
            "mean_size": float(metrics.sizes.mean()),
            "Spearman": metrics.spearman,
            "Size-Stratified Risk": metrics.stratified_risks,
            "mse": metrics.mse,
        }
    )

    results = {
        "risk": metrics.risk,
        "sizes": metrics.sizes,
        "spearman": metrics.spearman,
        "size-stratified risk": metrics.stratified_risks,
        "mse": metrics.mse,
        "spatial_miscoverage": metrics.spatial_miscoverage,
        "lhat": state.lhat,
    }
    results.update(images["raw"])
    if fname is not None:
        with open(fname, "wb") as fh:
            pickle.dump(results, fh, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"Results saved to file {fname}!")
    logger.close()
    return results


def _wandb_agent_config() -> Optional[dict]:
    """Config from a live wandb sweep agent, or None.

    The reference's operational workflow is ``wandb sweep config.yml`` +
    agents; each agent process runs the sweep's ``program:`` with no CLI
    args and publishes the grid point via ``wandb.config``
    (reference README.md:26-34, core/scripts/router.py:36-52). When this
    process was spawned by an agent (WANDB_SWEEP_ID set), initialize the
    run and hand its config to the normal pipeline.
    """
    if not os.environ.get("WANDB_SWEEP_ID"):
        return None
    try:
        import wandb  # type: ignore
    except Exception:
        return None
    wandb.init()
    return dict(wandb.config)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config",
        default=None,
        help="sweep YAML (wandb schema ok); omit under a wandb sweep agent",
    )
    parser.add_argument("--grid-index", type=int, default=None)
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--output-dir", default=None)
    args = parser.parse_args(argv)

    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.config is None:
        config = _wandb_agent_config()
        if config is None:
            parser.error("--config is required outside a wandb sweep agent")
        if args.data_path:
            config["data_path"] = args.data_path
        if args.output_dir:
            config["output_dir"] = args.output_dir
        run_experiment(config)
        return
    grid = load_config(args.config, args.grid_index)
    print(f"{len(grid)} grid point(s).")
    for i, config in enumerate(grid):
        if args.data_path:
            config["data_path"] = args.data_path
        if args.output_dir:
            config["output_dir"] = args.output_dir
        print(f"--- grid point {i}: {config['uncertainty_type']}, lr={config['lr']} ---")
        run_experiment(config)


if __name__ == "__main__":
    main()
