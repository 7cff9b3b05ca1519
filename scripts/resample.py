"""Shim: the implementation lives in ``fetalsyngen_tpu.scripts.resample``
(installed as the ``fsg-resample`` console script)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fetalsyngen_tpu.scripts.resample import main

if __name__ == "__main__":
    main()
