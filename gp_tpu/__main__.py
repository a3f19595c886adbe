"""``python -m gp_tpu`` == ``python -m gp_tpu.cli``."""

import sys

from .cli import main

sys.exit(main())
