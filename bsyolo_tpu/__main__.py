"""`python -m bsyolo_tpu` -> the `yolo`-grammar CLI."""

import sys

from bsyolo_tpu.cli import main

sys.exit(main())
