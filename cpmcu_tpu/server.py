"""``python -m cpmcu_tpu.server`` — alias of serve.server (reference: python -m cpmcu.server)."""

from .serve.server import main

if __name__ == "__main__":
    import sys

    sys.exit(main())
