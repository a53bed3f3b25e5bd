"""`python -m ofdm_tpu` — the simulation-runner CLI (see ofdm_tpu.main).

The reference is invoked as `python src/ofdm_based_systems/main.py`
(main.py:347); this makes the installed-package spelling work too.
"""

import sys

from ofdm_tpu.main import main

if __name__ == "__main__":
    sys.exit(main())
