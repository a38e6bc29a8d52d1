"""eofinfo — see exp_tpu.cli.analysis_tools.eofinfo."""

import sys

from exp_tpu.cli.analysis_tools import eofinfo as main

if __name__ == "__main__":
    sys.exit(main() or 0)
