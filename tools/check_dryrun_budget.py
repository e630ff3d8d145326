"""Guard: dryrun_multichip(8) must finish inside the driver's time budget.

Round 4 shipped a red MULTICHIP_r04.json (rc=124): three legs were added to
the dryrun without re-checking total wall-clock, and the driver's timeout
killed the run mid-leg-6 (VERDICT r4 weak #1). This tool runs the dryrun
under `timeout BUDGET` exactly like the driver does and fails loudly when
the budget is exceeded, so a future leg addition cannot silently regress
the deliverable again.

Usage:
    python tools/check_dryrun_budget.py [--budget SECONDS] [--cold]

--cold wipes the persistent dryrun compile cache first (worst case: the
driver runs from a checkout whose .jax_cache_dryrun is missing/stale).
Default budget 600 s: round 3's 4-leg dryrun passed the driver's budget and
round 4's ~1221 s run did not, so the real budget lies between; 600 s keeps
comfortable margin below any plausible value.

Measured on this host (round 5, single-core CPU quota, after the
shard_map multiseed rewrite and leg shrinks; final 8-leg tree incl. the
resize-island leg):
  cold (no cache): 220.9 s = 37% of budget
  warm (cache hit): 100-160 s = 17-26% of budget (host-load dependent)
(The pre-fix round-4 dryrun ran ~1221 s on this host under the VERDICT
re-run — the driver killed it at rc=124.)
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=600.0)
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--cold", action="store_true",
                    help="wipe .jax_cache_dryrun first (worst-case timing)")
    args = ap.parse_args()

    if args.cold:
        cache = os.path.join(REPO, ".jax_cache_dryrun")
        if os.path.isdir(cache):
            shutil.rmtree(cache)
            print(f"wiped {cache}")

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)  # drop the axon plugin: CPU-only validation
    code = f"import __graft_entry__ as g; g.dryrun_multichip({args.n_devices})"
    t0 = time.monotonic()
    proc = subprocess.run(
        ["timeout", str(int(args.budget)), sys.executable, "-c", code],
        cwd=REPO, env=env, text=True, capture_output=True,
    )
    dt = time.monotonic() - t0
    sys.stdout.write(proc.stdout)
    tail = "\n".join(proc.stderr.strip().splitlines()[-3:])
    if tail:
        print(f"[stderr tail]\n{tail}")
    mode = "COLD" if args.cold else "WARM"
    if proc.returncode == 124:
        print(f"FAIL: dryrun_multichip({args.n_devices}) exceeded the "
              f"{args.budget:.0f}s budget ({mode}) — trim legs or compile "
              f"surface before the driver does this for you (rc=124).")
        return 1
    if proc.returncode != 0:
        print(f"FAIL: dryrun exited rc={proc.returncode} after {dt:.1f}s")
        return proc.returncode
    frac = dt / args.budget
    print(f"{mode} OK: dryrun_multichip({args.n_devices}) finished in "
          f"{dt:.1f}s = {100 * frac:.0f}% of the {args.budget:.0f}s budget")
    if frac > 0.8:
        print("WARN: >80% of budget — margin is thin; investigate before "
              "adding legs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
