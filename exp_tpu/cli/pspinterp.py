"""pspinterp — see exp_tpu.cli.psptools.pspinterp."""

import sys

from exp_tpu.cli.psptools import pspinterp as main

if __name__ == "__main__":
    sys.exit(main() or 0)
