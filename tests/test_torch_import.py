"""Reference torch-checkpoint import: weight porting + CLI round trip.

Imports the reference implementation as the oracle: builds its
ModelWithUncertainty, ports the weights through the public interop API,
and requires full-forward agreement; then round-trips a whole-module
pickle (the reference's on-disk checkpoint format) through the import CLI
into this framework's serving path.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
if not os.path.exists("/root/reference/core"):
    pytest.skip("reference tree not mounted", allow_module_level=True)

import torch  # noqa: E402
from core.models.add_uncertainty import add_uncertainty as ref_add_uncertainty  # noqa: E402
from core.models.trunks.unet import UNet as RefUNet  # noqa: E402
from core.models.trunks.wnet import WNet as RefWNet  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from im2im_uq_tpu.interop.torch_import import (  # noqa: E402
    load_reference_checkpoint,
    port_state_dict,
)
from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk  # noqa: E402
from im2im_uq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()

QPARAMS = {
    "model": "UNet", "uncertainty_type": "quantiles",
    "q_lo": 0.05, "q_hi": 0.95,
    "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
}


def _forward_ours(state, x_nhwc):
    return np.asarray(state.apply(jnp.asarray(x_nhwc)))


def _assert_close(ours, ref, atol):
    scale = np.abs(ref).std() + 1e-12
    np.testing.assert_allclose(ours / scale, ref / scale, rtol=0, atol=atol)


def test_port_state_dict_quantiles_forward_parity():
    torch.manual_seed(0)
    ref = ref_add_uncertainty(RefUNet(1, 1), dict(QPARAMS, device="cpu"))
    ref.eval()
    params, stats = port_state_dict(ref.state_dict(), "UNet", "quantiles")
    state = add_uncertainty(build_trunk(QPARAMS), QPARAMS).replace(
        variables={"params": params, "batch_stats": stats}
    )
    x = np.random.RandomState(0).randn(2, 40, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(np.moveaxis(x, -1, 1))).numpy()  # (B,3,C,H,W)
    got = _forward_ours(state, x)[:, :, :, :, 0]  # (B,3,H,W)
    _assert_close(got, ref_out[:, :, 0], atol=2e-5)


def test_port_state_dict_wnet_softmax_forward_parity():
    torch.manual_seed(1)
    params_cfg = {"model": "WNet", "uncertainty_type": "softmax",
                  "num_softmax": 7, "device": "cpu"}
    ref = ref_add_uncertainty(RefWNet(1, 1), params_cfg)
    ref.eval()
    params, stats = port_state_dict(ref.state_dict(), "WNet", "softmax")
    state = add_uncertainty(build_trunk(params_cfg), params_cfg).replace(
        variables={"params": params, "batch_stats": stats}
    )
    x = np.random.RandomState(1).randn(2, 32, 32, 2).astype(np.float32)
    with torch.no_grad():
        # reference softmax layer emits (B, S, 1, H, W) for one output channel
        ref_out = ref(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
    got = _forward_ours(state, x)  # ours: (B, S, H, W, C)
    _assert_close(got[:, :, :, :, 0], ref_out.reshape(got.shape[0], 7, 32, 32), atol=2e-5)


def test_load_reference_checkpoint_carries_lhat(tmp_path):
    torch.manual_seed(2)
    ref = ref_add_uncertainty(RefUNet(1, 1), dict(QPARAMS, device="cpu"))
    ref.set_lhat(torch.tensor(2.25))
    path = str(tmp_path / "CP_epoch3_ref.pth")
    torch.save(ref, path)
    state = load_reference_checkpoint(
        path, QPARAMS, reference_path="/root/reference",
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    assert state.lhat == pytest.approx(2.25)
    lo, pred, hi = state.nested_sets(jnp.zeros((1, 32, 32, 1)))
    assert np.all(np.asarray(lo) <= np.asarray(hi))


def test_import_cli_roundtrip(tmp_path):
    import yaml

    from im2im_uq_tpu.scripts.import_torch import main as import_main
    from im2im_uq_tpu.scripts.infer import load_uq_state_for_inference
    from im2im_uq_tpu.training.checkpoint import calibrated_checkpoint_path
    from im2im_uq_tpu.utils.config import load_config

    torch.manual_seed(3)
    ref = ref_add_uncertainty(RefUNet(1, 1), dict(QPARAMS, device="cpu"))
    ref.set_lhat(torch.tensor(1.5))
    ref.eval()
    ckpt = str(tmp_path / "CP_epoch10_fastmri_quantiles_78_0.0001_standard_standard.pth")
    torch.save(ref, ckpt)

    cfg = dict(QPARAMS, dataset="fastmri", batch_size=78, lr=0.0001, epochs=10,
               input_normalization="standard", output_normalization="standard",
               num_inputs=1)
    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    outdir = str(tmp_path / "out")
    assert import_main([
        "--checkpoint", ckpt, "--config", cfg_path,
        "--reference-path", "/root/reference", "--output-dir", outdir,
    ]) == 0
    full_cfg = load_config(cfg_path)[0]
    # epoch parsed from the input filename; calibrated artifact written
    assert os.path.exists(
        os.path.join(outdir, "CP_epoch10_fastmri_quantiles_78_0.0001_standard_standard.msgpack")
    )
    restored = load_uq_state_for_inference(
        full_cfg, calibrated_checkpoint_path(outdir, full_cfg)
    )
    assert restored.lhat == pytest.approx(1.5)
    x = np.random.RandomState(3).randn(1, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
    got = np.asarray(restored.apply(jnp.asarray(x)))[:, :, :, :, 0]
    scale = np.abs(ref_out).std() + 1e-12
    np.testing.assert_allclose(
        got / scale, ref_out[:, :, 0] / scale, rtol=0, atol=2e-5
    )


def test_bare_state_dict_carries_lhat(tmp_path):
    """A plain module.state_dict() save (standard torch practice) still
    imports the calibrated lhat from its registered-buffer entry."""
    torch.manual_seed(4)
    ref = ref_add_uncertainty(RefUNet(1, 1), dict(QPARAMS, device="cpu"))
    ref.set_lhat(torch.tensor(3.75))
    path = str(tmp_path / "sd.pth")
    torch.save(ref.state_dict(), path)
    state = load_reference_checkpoint(path, QPARAMS)
    assert state.lhat == pytest.approx(3.75)


def test_export_roundtrip_bit_exact():
    """import → export reproduces the reference state_dict tensors exactly."""
    from im2im_uq_tpu.interop.torch_export import export_state_dict

    torch.manual_seed(5)
    ref = ref_add_uncertainty(RefUNet(1, 1), dict(QPARAMS, device="cpu"))
    sd = ref.state_dict()
    params, stats = port_state_dict(sd, "UNet", "quantiles")
    back = export_state_dict(
        {"params": params, "batch_stats": stats}, "UNet", "quantiles"
    )
    assert set(back) == set(sd)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy(), err_msg=k)


def test_export_loads_into_reference_with_forward_parity():
    """A model trained HERE serves identically in the reference framework."""
    import jax

    from im2im_uq_tpu.interop.torch_export import export_state_dict

    state = add_uncertainty(
        build_trunk(QPARAMS), QPARAMS, rng=jax.random.key(7),
        example_input=jnp.zeros((1, 32, 32, 1)),
    ).set_lhat(1.25)
    sd = export_state_dict(
        state.variables, "UNet", "quantiles", lhat=state.lhat
    )
    ref = ref_add_uncertainty(RefUNet(1, 1), dict(QPARAMS, device="cpu"))
    ref.set_lhat(torch.tensor(0.0))  # materialize the buffer for strict load
    ref.load_state_dict(sd)
    ref.eval()
    assert float(ref.lhat) == pytest.approx(1.25)
    x = np.random.RandomState(9).randn(2, 40, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
    got = _forward_ours(state, x)[:, :, :, :, 0]
    _assert_close(got, ref_out[:, :, 0], atol=2e-5)
