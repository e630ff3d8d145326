"""Measure the reference implementation's training throughput on this host.

Runs the ACTUAL reference code (imported from /root/reference, not copied):
UNet + quantile head via add_uncertainty, forward + loss + backward + Adam
step on torch-CPU (the only hardware torch has here; the reference repo has
no TPU path). Writes BENCH_BASELINE.json, which bench.py uses for
vs_baseline. Hardware differs (TPU v5e vs host CPU) — recorded in the JSON
so the comparison is interpretable.
"""

import json
import os
import sys
import time
import types

import numpy as np

# the reference imports wandb at module scope; stub it (not installed here)
wandb_stub = types.ModuleType("wandb")
wandb_stub.log = lambda *a, **k: None
wandb_stub.init = lambda *a, **k: None
wandb_stub.watch = lambda *a, **k: None
wandb_stub.config = {}
sys.modules.setdefault("wandb", wandb_stub)
# dill is imported by the reference trainer; alias to pickle if absent
try:
    import dill  # noqa: F401
except ImportError:
    import pickle

    sys.modules["dill"] = pickle

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from core.models.add_uncertainty import add_uncertainty  # noqa: E402
from core.models.trunks.unet import UNet  # noqa: E402

BATCH = 4
IMAGE = 320
STEPS = 6


def main() -> None:
    torch.manual_seed(0)
    params = {
        "uncertainty_type": "quantiles",
        "q_lo": 0.05,
        "q_hi": 0.95,
        "q_lo_weight": 1.0,
        "q_hi_weight": 1.0,
        "mse_weight": 1.0,
        "device": "cpu",
    }
    model = add_uncertainty(UNet(1, 1), params)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(BATCH, 1, IMAGE, IMAGE)
    y = torch.randn(BATCH, 1, IMAGE, IMAGE)

    # warmup
    loss = model.loss_fn(model(x), y)
    opt.zero_grad()
    loss.backward()
    opt.step()

    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss = model.loss_fn(model(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    imgs_per_sec = BATCH * STEPS / dt

    out = {
        "train_imgs_per_sec_per_chip": imgs_per_sec,
        "hardware": "host CPU (torch, reference implementation)",
        "batch": BATCH,
        "image": IMAGE,
        "steps": STEPS,
        "note": "reference repo has no TPU path; this is its throughput on the "
        "only hardware it can use on this host",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_BASELINE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
