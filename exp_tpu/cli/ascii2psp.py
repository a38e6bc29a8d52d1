"""ascii2psp — see exp_tpu.cli.psptools.ascii2psp."""

import sys

from exp_tpu.cli.psptools import ascii2psp as main

if __name__ == "__main__":
    sys.exit(main() or 0)
