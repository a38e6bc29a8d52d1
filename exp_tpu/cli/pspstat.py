"""pspstat — see exp_tpu.cli.psptools.pspstat."""

import sys

from exp_tpu.cli.psptools import pspstat as main

if __name__ == "__main__":
    sys.exit(main() or 0)
