"""Shim: the CLI moved into the package (hsenet_tpu/cli/); this
path keeps `python scripts/convert_reference_checkpoint.py ...` working and the
`hsenet-convert` console script points at the same main."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hsenet_tpu.cli.convert_checkpoint import main

if __name__ == "__main__":
    main()
