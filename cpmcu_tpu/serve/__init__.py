"""Serving layer: CLI, OpenAI-compatible server, display, datasets.

Structural counterpart of the reference's cpmcu/cli.py, cpmcu/server.py and
cpmcu/common/ (args, logging, display, benchmark, openai_api, utils/factory).
"""

from .factory import create_engine  # noqa: F401
