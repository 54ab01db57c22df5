"""``python -m dataflows_ray`` entry point (reference: ``dataflows`` CLI)."""

import sys

from .cli import main

sys.exit(main())
