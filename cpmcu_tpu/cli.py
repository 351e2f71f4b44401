"""``python -m cpmcu_tpu.cli`` — alias of serve.cli (reference: python -m cpmcu.cli)."""

from .serve.cli import main

if __name__ == "__main__":
    import sys

    sys.exit(main())
