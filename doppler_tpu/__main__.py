"""``python -m doppler_tpu`` — the doppler-compatible CLI entry point."""

import sys

from doppler_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
