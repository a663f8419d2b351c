"""``python -m trico_tpu`` == ``python -m trico_tpu.cli``."""

from .cli import main

raise SystemExit(main())
