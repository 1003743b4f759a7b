"""Correctness-gated query registry.

Importing this package populates ``QUERIES`` / ``ORACLES`` (see
``registry.py``); ``__spark_entry__.py`` at the repo root simply
re-exports them for the driver.
"""

from .registry import ORACLES, QUERIES, register

from . import generic  # noqa: E402,F401
from . import wrflike  # noqa: E402,F401
from . import llm  # noqa: E402,F401

__all__ = ["ORACLES", "QUERIES", "register"]
