"""Runtime utilities (maps reference ultralytics/utils/)."""

import logging
import os

LOGGER = logging.getLogger("bsyolo_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(os.environ.get("BSYOLO_LOGLEVEL", "INFO"))
