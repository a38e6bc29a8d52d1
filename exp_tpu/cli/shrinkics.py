"""shrinkics — see exp_tpu.cli.psptools.shrinkics."""

import sys

from exp_tpu.cli.psptools import shrinkics as main

if __name__ == "__main__":
    sys.exit(main() or 0)
