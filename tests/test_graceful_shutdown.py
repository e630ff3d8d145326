"""graceful_shutdown: SIGTERM → checkpoint at a step boundary → clean resume.

The reference has no preemption story at all (SURVEY.md §5: no failure
detection/elastic recovery); this is the cloud-TPU-native extension. A
signal mid-training must produce a resumable checkpoint and an interrupted
+resumed run must reproduce the uninterrupted run's parameters.
"""

import os
import signal

import numpy as np
import pytest

from im2im_uq_tpu.data.synthetic import SyntheticDataset
from im2im_uq_tpu.training.train import PreemptionInterrupt, train_net
from im2im_uq_tpu.utils.cache import enable_compilation_cache

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()

BASE_CFG = {
    "dataset": "synthetic", "model": "UNet", "uncertainty_type": "quantiles",
    "batch_size": 4, "lr": 1e-3, "input_normalization": "standard",
    "output_normalization": "min-max", "q_lo": 0.05, "q_hi": 0.95,
    "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
    "graceful_shutdown": True,
}


class _SignalingDataset:
    """Sends SIGTERM to the current process on one example access."""

    def __init__(self, dataset, signal_index):
        self.dataset, self.signal_index = dataset, signal_index
        self.sent = False

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        if i == self.signal_index and not self.sent:
            self.sent = True
            os.kill(os.getpid(), signal.SIGTERM)
        return self.dataset[i]


def _fresh_state(cfg):
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk

    return add_uncertainty(build_trunk(cfg), cfg, rng=jax.random.key(0),
                           example_input=jnp.zeros((1, 16, 16, 1)))


def _kernel(state):
    return np.asarray(state.variables["params"]["trunk"]["inc"]["conv0"]["kernel"])


def test_sigterm_epoch_boundary_checkpoint_and_resume(tmp_path):
    """Default pipeline: the signal finishes the current epoch, saves it as
    a whole-epoch checkpoint (even off the checkpoint_every grid), and the
    resumed run matches the uninterrupted one."""
    cfg = dict(BASE_CFG, epochs=2, checkpoint_every=10)
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)
    ref = train_net(_fresh_state(cfg), ds, ds, None, epochs=2, batch_size=4,
                    lr=1e-3, validate_every=10, config=dict(cfg, graceful_shutdown=False))

    with pytest.raises(PreemptionInterrupt) as ei:
        train_net(_fresh_state(cfg), _SignalingDataset(ds, signal_index=int(
            np.random.RandomState(1).permutation(8)[0])), ds, None,
            epochs=2, batch_size=4, lr=1e-3, checkpoint_dir=str(tmp_path),
            checkpoint_every=10, validate_every=10, config=cfg)
    assert os.path.exists(ei.value.checkpoint_path)
    assert "CP_epoch1_" in ei.value.checkpoint_path

    resumed = train_net(_fresh_state(cfg), ds, ds, None, epochs=2, batch_size=4,
                        lr=1e-3, load_from_checkpoint=True,
                        checkpoint_dir=str(tmp_path), checkpoint_every=10,
                        validate_every=10,
                        config=dict(cfg, graceful_shutdown=False))
    np.testing.assert_allclose(_kernel(resumed), _kernel(ref), rtol=1e-6, atol=1e-7)


def test_sigterm_midepoch_checkpoint_and_resume_grain(tmp_path):
    """Grain pipeline: the signal saves the exact mid-epoch position; the
    resumed run replays nothing and matches the uninterrupted run."""
    pytest.importorskip("grain")
    cfg = dict(BASE_CFG, epochs=1, checkpoint_every=10,
               input_pipeline="grain", checkpoint_every_steps=100)
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)
    ref = train_net(_fresh_state(cfg), ds, ds, None, epochs=1, batch_size=4,
                    lr=1e-3, validate_every=10,
                    config=dict(cfg, graceful_shutdown=False))

    with pytest.raises(PreemptionInterrupt) as ei:
        train_net(_fresh_state(cfg), _SignalingDataset(ds, signal_index=0), ds,
                  None, epochs=1, batch_size=4, lr=1e-3,
                  checkpoint_dir=str(tmp_path), checkpoint_every=10,
                  validate_every=10, config=cfg)
    assert os.path.exists(ei.value.checkpoint_path)
    assert "CP_midepoch_" in ei.value.checkpoint_path

    resumed = train_net(_fresh_state(cfg), ds, ds, None, epochs=1, batch_size=4,
                        lr=1e-3, load_from_checkpoint=True,
                        checkpoint_dir=str(tmp_path), checkpoint_every=10,
                        validate_every=10,
                        config=dict(cfg, graceful_shutdown=False))
    np.testing.assert_allclose(_kernel(resumed), _kernel(ref), rtol=1e-6, atol=1e-7)


def test_signal_handlers_restored(tmp_path):
    cfg = dict(BASE_CFG, epochs=1, checkpoint_every=10)
    ds = SyntheticDataset(num_examples=4, image_size=16, seed=0)
    before = signal.getsignal(signal.SIGTERM)
    train_net(_fresh_state(cfg), ds, ds, None, epochs=1, batch_size=4, lr=1e-3,
              checkpoint_dir=str(tmp_path), checkpoint_every=10,
              validate_every=10, config=cfg)
    assert signal.getsignal(signal.SIGTERM) is before


def test_sigterm_on_periodic_checkpoint_step_grain(tmp_path):
    """Regression: the signal landing on a periodic mid-epoch-checkpoint
    step (losses already flushed) must still save and raise cleanly."""
    pytest.importorskip("grain")
    cfg = dict(BASE_CFG, epochs=1, checkpoint_every=10,
               input_pipeline="grain", checkpoint_every_steps=1)
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)
    with pytest.raises(PreemptionInterrupt) as ei:
        train_net(_fresh_state(cfg), _SignalingDataset(ds, signal_index=0), ds,
                  None, epochs=1, batch_size=4, lr=1e-3,
                  checkpoint_dir=str(tmp_path), checkpoint_every=10,
                  validate_every=10, config=cfg)
    assert os.path.exists(ei.value.checkpoint_path)


def test_stale_midepoch_cleanup_without_periodic_steps(tmp_path):
    """Regression: a preemption-written CP_midepoch (no checkpoint_every_steps
    configured) is removed once its epoch completes on resume."""
    pytest.importorskip("grain")
    from im2im_uq_tpu.training.checkpoint import midepoch_checkpoint_path

    cfg = dict(BASE_CFG, epochs=1, checkpoint_every=10, input_pipeline="grain")
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)
    with pytest.raises(PreemptionInterrupt):
        train_net(_fresh_state(cfg), _SignalingDataset(ds, signal_index=0), ds,
                  None, epochs=1, batch_size=4, lr=1e-3,
                  checkpoint_dir=str(tmp_path), checkpoint_every=10,
                  validate_every=10, config=cfg)
    assert os.path.exists(midepoch_checkpoint_path(str(tmp_path), cfg))
    train_net(_fresh_state(cfg), ds, ds, None, epochs=1, batch_size=4,
              lr=1e-3, load_from_checkpoint=True, checkpoint_dir=str(tmp_path),
              checkpoint_every=10, validate_every=10,
              config=dict(cfg, graceful_shutdown=False))
    assert not os.path.exists(midepoch_checkpoint_path(str(tmp_path), cfg))
