"""wandb-sweep drop-in shim.

The reference's sweep YAMLs name ``program: core/scripts/router.py``
(reference: experiments/fastmri_test/config.yml:2). A user pointing
``wandb sweep`` at an unmodified reference config from this repo's root
lands here; delegate to the real router, which reads the grid point from
``wandb.config`` when spawned by a sweep agent.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from im2im_uq_tpu.scripts.router import main

if __name__ == "__main__":
    main()
