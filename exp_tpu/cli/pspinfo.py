"""pspinfo — see exp_tpu.cli.psptools.pspinfo."""

import sys

from exp_tpu.cli.psptools import pspinfo as main

if __name__ == "__main__":
    sys.exit(main() or 0)
